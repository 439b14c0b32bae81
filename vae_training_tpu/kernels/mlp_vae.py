"""Pallas TPU kernel: fused multi-step MLP-VAE training (sphere sweep,
linear-gaussian MLPs, and sigmoid dual-decoder MLPs).

Generalizes kernels/linear_vae.py to arbitrary ReLU MLP encoder/decoders
(e.g. the sphere sweep's 200|200|200 stacks,
/root/reference/sphere_vae_padding_expts.sh), including the sigmoid
dataset's dual decoder x̂ = σ(SigMLP(s)) + MLP(s)
(/root/reference/networks.py:75-78). Why it wins: on the XLA scan
path every step re-reads all weights + Adam moments from HBM (~6 MB for the
200³ config → HBM-bound at ~33 µs/step); here the whole parameter set and
optimizer state stay resident in VMEM for the entire K-step chunk, so each
step touches HBM only for its (1,1) loss-trace write.

Per step, in-kernel: TPU PRNG → Box-Muller → manifold sample (sphere or
linear-gaussian) → MLP encoder fwd → reparam → MLP decoder fwd → closed-form
ELBO → hand-derived backward through every layer (ReLU masks from saved
pre-activations) → bias-corrected Adam. Math matches
/root/reference/networks.py:26-101; equivalence against the XLA/optax path
is tested with the external-noise hook (tests/test_mlp_kernel.py).

Padding: each dimension is rounded up to a multiple of 128 lanes. Padded
parameter regions start at zero and stay zero (ReLU(0)=0 keeps padded
columns dead through hidden layers; gradients vanish on padded rows/cols
given masked noise and batch rows).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..train.state import TrainState
from ..train.step import StepFns, make_step_fns
from .linear_vae import (
    LOG_2PI,
    chunk_seed_and_t0,
    _adam,
    _adam_state,
    _col_mask,
    _normal_block,
    _normal_block_pair,
    _pack_mat,
    _row_mask,
    packed_noise_ok,
    row_tile,
)

# the MLP kernel's lane width IS linear_vae's N: packed_noise_ok and the
# packed windows (LANE // 2 rolls) assume the same half-lane gate
from .linear_vae import N as LANE  # noqa: E402


def pad_dim(d: int) -> int:
    return max(LANE, ((d + LANE - 1) // LANE) * LANE)


def _layer_dims(features: Sequence[int], in_dim: int) -> List[Tuple[int, int]]:
    dims, prev = [], in_dim
    for f in features:
        dims.append((prev, f))
        prev = f
    return dims


def _make_kernel(
    *,
    n_steps: int,
    batch: int,
    data_dim: int,
    latent_dim: int,
    enc_dims: List[Tuple[int, int]],
    dec_dims: List[Tuple[int, int]],
    dataset_kind: str,  # "sphere" | "linear" | "sigmoid"
    intrinsic_dim: int,
    var_added: float,
    eps_const: float,
    tdv: bool,
    lr: float,
    external_noise: bool,
    grid: bool = False,  # one grid step per sweep seed (lead dim 1 blocks)
    dual: bool = False,  # sigmoid-dataset decoder pair: x̂ = σ(Sig(s)) + Dec(s)
    fp32_dots: bool = False,  # Precision.HIGHEST matmuls (--precision fp32)
    packed_noise: bool = False,  # one Box-Muller pair feeds ALL noise lanes
    raw_noise: bool = False,  # external blocks are the RAW Box-Muller pair
    l0_in_rows: Tuple[int, int] = (LANE, LANE),  # Adam live-row bounds for
    # the stacks' FIRST layers (enc: data rows, dec/sig: latent rows)
):
    if batch > LANE:
        raise ValueError(f"fused kernel supports batch <= {LANE}, got {batch}")
    n_enc, n_dec = len(enc_dims), len(dec_dims)
    # weight-list layout: encoder stack, decoder stack, [sigmoid-head stack]
    # (the SigDecoder mirrors the decoder's dims — models/networks.py:87-90,
    # /root/reference/networks.py:75-78)
    n_sig = n_dec if dual else 0
    n_w = n_enc + n_dec + n_sig
    inv_b = 1.0 / batch
    # activation/noise blocks span only the batch's 8-aligned row tile (in
    # test mode too, so the equivalence suite exercises the tiled path)
    rows = row_tile(batch)

    # Adam live-row slicing (see linear_vae._make_kernel for the full
    # rationale): only the stacks' FIRST layers pay — their input rows
    # span data_dim/latent_dim (~24 live of a 128-row buffer) while hidden
    # layers are 208/256 live, where the operand-rebuild stores cost what
    # the slicing saves. The gate b*2 <= pin keeps exactly those wins.
    w_shapes = _padded_layer_shapes(enc_dims, dec_dims, dual)
    w_bounds = []
    for li, (pin, pout) in enumerate(w_shapes):
        if li == 0:
            b = l0_in_rows[0]
        elif li == n_enc or (dual and li == n_enc + n_dec):
            b = l0_in_rows[1]
        else:
            b = pin
        w_bounds.append(b if b * 2 <= pin else pin)

    def kernel(seed_ref, *refs):
        # ref layout: a_t, Ws(n_w), bs(n_w), vec, mWs, mbs, mvec, vWs, vbs,
        # vvec, [xn, z1n, z2n], then the same param/moment set as outputs,
        # then loss_ref.
        idx = 0
        a_t_ref = refs[idx]; idx += 1
        w_refs = refs[idx: idx + n_w]; idx += n_w
        b_refs = refs[idx: idx + n_w]; idx += n_w
        vec_ref = refs[idx]; idx += 1
        mw_refs = refs[idx: idx + n_w]; idx += n_w
        mb_refs = refs[idx: idx + n_w]; idx += n_w
        mvec_ref = refs[idx]; idx += 1
        vw_refs = refs[idx: idx + n_w]; idx += n_w
        vb_refs = refs[idx: idx + n_w]; idx += n_w
        vvec_ref = refs[idx]; idx += 1
        if external_noise:
            xn_ref, z1n_ref, z2n_ref = refs[idx: idx + 3]; idx += 3
        else:
            if grid:
                pltpu.prng_seed(seed_ref[pl.program_id(0), 0])
            else:
                pltpu.prng_seed(seed_ref[0])
        out_w = refs[idx: idx + n_w]; idx += n_w
        out_b = refs[idx: idx + n_w]; idx += n_w
        out_vec = refs[idx]; idx += 1
        out_mw = refs[idx: idx + n_w]; idx += n_w
        out_mb = refs[idx: idx + n_w]; idx += n_w
        out_mvec = refs[idx]; idx += 1
        out_vw = refs[idx: idx + n_w]; idx += n_w
        out_vb = refs[idx: idx + n_w]; idx += n_w
        out_vvec = refs[idx]; idx += 1
        loss_ref = refs[idx]

        if grid:
            # per-row scalars [seed, t0, data_dim, latent_dim, intrinsic]:
            # dims ride the scalar-prefetch buffer so MIXED-dimension sweep
            # rows share one launch (padded buffer shapes are identical —
            # every dim ≤ LANE pads to LANE, hidden widths are uniform)
            pid = pl.program_id(0)
            t0 = seed_ref[pid, 1].astype(jnp.float32)
            dd_i, ld_i, id_i = seed_ref[pid, 2], seed_ref[pid, 3], seed_ref[pid, 4]
            ld = lambda r: r[0]
            ldn = lambda r, i: r[0, i]  # noise blocks: leading seed axis 1
        else:
            t0 = seed_ref[1].astype(jnp.float32)
            dd_i, ld_i, id_i = data_dim, latent_dim, intrinsic_dim
            ld = lambda r: r[:]
            ldn = lambda r, i: r[i]
        a_t = ld(a_t_ref)
        dd_f = jnp.asarray(dd_i).astype(jnp.float32)
        lat_m = _col_mask(ld_i)
        dat_m = _col_mask(dd_i)
        int_m = _col_mask(id_i)
        row_m = _row_mask(batch, rows)
        if dataset_kind == "sigmoid":
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            sig_col_m = (col_ids == id_i).astype(jnp.float32)

        # Matmul precision. Mosaic's DEFAULT f32 dot feeds the MXU single-pass
        # bfloat16 operands with f32 accumulation (measured: identical output
        # to an explicit bf16 operand cast) — that hardware-native mode is
        # --precision bf16, the default, and what every headline number uses.
        # --precision fp32 forces Precision.HIGHEST (~3 bf16 passes per dot)
        # for true-fp32 arithmetic. Accumulation, masks, ELBO, gradients,
        # Adam, and the resident master weights are f32 in both modes. On the
        # CPU interpret backend (the equivalence suite) both modes are exact
        # fp32, so the math is pinned to jax.grad+optax either way.
        prec = jax.lax.Precision.HIGHEST if fp32_dots else None

        def dotf(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=prec)

        def dot_t1(a, b):  # aᵀ·b (contract batch/rows)
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        def dot_t2(a, b):  # a·bᵀ (contract last dims)
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

        def mlp_fwd(x, ws, bs, dims):
            """Returns (output, saved pre-activation relu masks, saved
            activations). ReLU between layers, none after the last."""
            acts = [x]
            relu_masks = []
            h = x
            for li in range(len(ws)):
                z = dotf(h, ws[li]) + bs[li]
                if li + 1 < len(ws):
                    h = jnp.maximum(z, 0.0)
                    relu_masks.append((z > 0.0).astype(jnp.float32))
                    acts.append(h)
                else:
                    h = z
            return h, relu_masks, acts

        def mlp_bwd(g_out, ws, relu_masks, acts):
            """Backward through the stack; returns (gWs, gbs, g_input)."""
            g_ws = [None] * len(ws)
            g_bs = [None] * len(ws)
            g = g_out
            for li in range(len(ws) - 1, -1, -1):
                g_ws[li] = dot_t1(acts[li], g)
                g_bs[li] = jnp.sum(g, axis=0, keepdims=True)
                if li > 0:
                    g = dot_t2(g, ws[li]) * relu_masks[li - 1]
            # after the loop g is the gradient at layer 0's output (== g_out
            # for a single-layer stack, since the loop never updates g)
            g_in = dot_t2(g, ws[0])
            return g_ws, g_bs, g_in

        def manifold_x(n_int):
            if dataset_kind == "sphere":
                norm2 = jnp.sum(n_int * n_int, axis=1, keepdims=True)
                x = n_int * jax.lax.rsqrt(jnp.maximum(norm2, 1e-20))
                return x * int_m  # live cols only (dim == intrinsic here)
            if dataset_kind == "sigmoid":
                # Y = [z, σ(z·A), 0-pad]: A's column sits at a_t[:, dim]
                # so the matmul lands the logit in the σ-coordinate col
                logit = dotf(n_int, a_t)
                return n_int + jax.nn.sigmoid(logit) * sig_col_m
            return dotf(n_int, a_t)

        def packed_sample(n_raw, z1_raw):
            # Packed mode (see kernels/linear_vae.py for the full
            # rationale): ONE Box-Muller pair supplies every noise consumer
            # from disjoint lane windows — manifold draw from block A's
            # UPPER half (repositioned by a static half-width lane roll),
            # z2 from A's lower half, z1 from B's lower half, observation
            # noise from B's upper half. Callers gate on every dim <=
            # LANE // 2 so the windows never overlap; the per-step PRNG +
            # transcendental work halves, statistics unchanged. Shared by
            # the production path and the raw_noise test hook.
            n_int = pltpu.roll(n_raw, shift=LANE // 2, axis=1) * int_m
            x = manifold_x(n_int) * row_m
            z1 = z1_raw * lat_m * row_m
            z2 = n_raw * dat_m * row_m
            if dataset_kind == "linear" and var_added > 0.0:
                var_blk = pltpu.roll(z1_raw, shift=LANE // 2, axis=1)
                x = x + var_blk * dat_m * row_m * math.sqrt(var_added)
            return x, z1, z2

        def wfull(w, li):
            b, (pin, pout) = w_bounds[li], w_shapes[li]
            if b >= pin:
                return w
            return jnp.concatenate(
                [w, jnp.zeros((pin - b, pout), jnp.float32)], axis=0)

        def body(i, carry):
            (ws, bs, vec, mws, mbs, mvec, vws, vbs, vvec) = carry
            ws_f = tuple(wfull(w, li) for li, w in enumerate(ws))
            t = t0 + i.astype(jnp.float32) + 1.0

            if external_noise and raw_noise:
                # packed derivation from caller-supplied raw pair (test hook)
                x, z1, z2 = packed_sample(ldn(xn_ref, i), ldn(z1n_ref, i))
            elif external_noise:
                x = ldn(xn_ref, i)
                z1 = ldn(z1n_ref, i)
                z2 = ldn(z2n_ref, i)
            elif packed_noise:
                n_raw, z1_raw = _normal_block_pair(rows)
                x, z1, z2 = packed_sample(n_raw, z1_raw)
            else:
                n_raw, z1_raw = _normal_block_pair(rows)
                x = manifold_x(n_raw * int_m) * row_m
                z1 = z1_raw * lat_m * row_m
                if dataset_kind == "linear" and var_added > 0.0:
                    # pair z2 with the observation noise: one transform
                    z2_raw, var_raw = _normal_block_pair(rows)
                    x = (x + var_raw * dat_m * row_m
                         * math.sqrt(var_added))
                    z2 = z2_raw * dat_m * row_m
                else:
                    z2 = _normal_block(rows) * dat_m * row_m

            be_w = ws_f[:n_enc]
            be_b = bs[:n_enc]
            de_w = ws_f[n_enc:n_enc + n_dec]
            de_b = bs[n_enc:n_enc + n_dec]
            if dual:
                sg_w = ws_f[n_enc + n_dec:]
                sg_b = bs[n_enc + n_dec:]

            ep = vec[2:3, :] * lat_m
            if tdv:
                eps = vec[3, 0] * eps_const
            else:
                eps = jnp.float32(eps_const)

            # --- forward --------------------------------------------------
            mu_raw, enc_masks, enc_acts = mlp_fwd(x, be_w, be_b, enc_dims)
            mu = mu_raw * row_m * lat_m
            sdev = jnp.exp(ep * 0.5) * lat_m
            s = mu + sdev * z1
            y_raw, dec_masks, dec_acts = mlp_fwd(s, de_w, de_b, dec_dims)
            if dual:
                # x̂ = σ(SigDecoder(s)) + Decoder(s); mask σ's output —
                # padded cols would otherwise see σ(0) = 0.5
                u_raw, sig_masks, sig_acts = mlp_fwd(s, sg_w, sg_b, dec_dims)
                sig_u = jax.nn.sigmoid(u_raw)
                y_raw = y_raw + sig_u
            y = (y_raw * dat_m + z2 * jnp.exp(eps * 0.5)) * row_m
            r = y - x
            inv_var = jnp.exp(-eps)

            # --- loss -----------------------------------------------------
            kl_const = jnp.sum(-0.5 * (1.0 + ep - jnp.exp(ep)) * lat_m)
            sum_mu2 = jnp.sum(mu * mu)
            sum_r2 = jnp.sum(r * r)
            # dd_f · (0.5·(log2π+ε)) — bitwise-equal between solo (static
            # dd) and grid (scalar-prefetched dd) paths
            loss = (kl_const + 0.5 * inv_b * sum_mu2
                    + 0.5 * inv_var * inv_b * sum_r2
                    + dd_f * (0.5 * (LOG_2PI + eps)))
            loss_ref[pl.ds(i, 1), :] = loss.reshape(1, 1)

            # --- backward ---------------------------------------------------
            g_y = r * (inv_var * inv_b)
            g_dec_out = g_y * dat_m
            g_de_w, g_de_b, g_s = mlp_bwd(g_dec_out, de_w, dec_masks, dec_acts)
            if dual:
                g_u = g_dec_out * sig_u * (1.0 - sig_u)
                g_sg_w, g_sg_b, g_s2 = mlp_bwd(g_u, sg_w, sig_masks, sig_acts)
                g_s = g_s + g_s2
            g_mu = (g_s + mu * inv_b) * lat_m
            g_en_w, g_en_b, _ = mlp_bwd(g_mu, be_w, enc_masks, enc_acts)
            g_ep = (jnp.sum(g_s * z1, axis=0, keepdims=True) * 0.5 * sdev
                    + 0.5 * (jnp.exp(ep) - 1.0) * lat_m)
            if tdv:
                g_eps = (-0.5 * inv_var * inv_b * sum_r2 + 0.5 * dd_f
                         + jnp.sum(g_y * z2) * 0.5 * jnp.exp(eps * 0.5))
                col0 = (jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1) == 0)
                g_eps_row = jnp.where(col0, g_eps * eps_const, 0.0)
            else:
                g_eps_row = jnp.zeros((1, LANE), jnp.float32)
            g_vec = jnp.concatenate(
                [jnp.zeros((2, LANE), jnp.float32), g_ep, g_eps_row,
                 jnp.zeros((4, LANE), jnp.float32)], axis=0)

            # --- Adam -------------------------------------------------------
            g_all_w = g_en_w + g_de_w + (g_sg_w if dual else [])
            g_all_b = g_en_b + g_de_b + (g_sg_b if dual else [])
            new_ws, new_mws, new_vws = [], [], []
            new_bs, new_mbs, new_vbs = [], [], []
            for li in range(n_w):
                p_, m_, v_ = _adam(ws[li], mws[li], vws[li],
                                   g_all_w[li][:w_bounds[li]], t, lr)
                new_ws.append(p_); new_mws.append(m_); new_vws.append(v_)
                p_, m_, v_ = _adam(bs[li], mbs[li], vbs[li], g_all_b[li], t, lr)
                new_bs.append(p_); new_mbs.append(m_); new_vbs.append(v_)
            vec, mvec, vvec = _adam(vec, mvec, vvec, g_vec, t, lr)
            return (tuple(new_ws), tuple(new_bs), vec,
                    tuple(new_mws), tuple(new_mbs), mvec,
                    tuple(new_vws), tuple(new_vbs), vvec)

        def ldw(r, li):
            return ld(r)[: w_bounds[li]]

        init = (
            tuple(ldw(r, li) for li, r in enumerate(w_refs)),
            tuple(ld(r) for r in b_refs),
            ld(vec_ref),
            tuple(ldw(r, li) for li, r in enumerate(mw_refs)),
            tuple(ld(r) for r in mb_refs),
            ld(mvec_ref),
            tuple(ldw(r, li) for li, r in enumerate(vw_refs)),
            tuple(ld(r) for r in vb_refs),
            ld(vvec_ref),
        )
        out = jax.lax.fori_loop(0, n_steps, body, init)

        def st(dst, val):
            if grid:
                dst[0] = val
            else:
                dst[:] = val

        def stw(dst, val, li):
            # rows beyond the live bound are zero by the padding invariant
            b, (pin, pout) = w_bounds[li], w_shapes[li]
            if b < pin:
                val = jnp.concatenate(
                    [val, jnp.zeros((pin - b, pout), val.dtype)], axis=0)
            st(dst, val)

        for group_out, group_val in (
            (out_w, out[0]), (out_mw, out[3]), (out_vw, out[6]),
        ):
            for li, (dst, val) in enumerate(zip(group_out, group_val)):
                stw(dst, val, li)
        for group_out, group_val in (
            (out_b, out[1]), (out_mb, out[4]), (out_vb, out[7]),
        ):
            for dst, val in zip(group_out, group_val):
                st(dst, val)
        st(out_vec, out[2])
        st(out_mvec, out[5])
        st(out_vvec, out[8])

    return kernel


# ---------------------------------------------------------------------------
# Packing + invocation
# ---------------------------------------------------------------------------


def _layer_groups(n_enc, n_dec, dual):
    """(group name, layer count) in the packed weight-list order."""
    groups = [("Encoder", n_enc), ("Decoder", n_dec)]
    if dual:
        groups.append(("SigDecoder", n_dec))
    return groups


def _all_layer_dims(enc_dims, dec_dims, dual):
    dims = list(enc_dims) + list(dec_dims)
    if dual:
        dims += list(dec_dims)  # SigDecoder mirrors the decoder stack
    return dims


def _padded_layer_shapes(enc_dims, dec_dims, dual=False):
    return [(pad_dim(din), pad_dim(dout))
            for din, dout in _all_layer_dims(enc_dims, dec_dims, dual)]


def _collect_layers(tree, n_enc, n_dec, dual=False):
    """Ordered (kernel, bias) lists: Encoder, Decoder, [SigDecoder] FC0..n."""
    ks, bs = [], []
    for group, count in _layer_groups(n_enc, n_dec, dual):
        for i in range(count):
            ks.append(tree[group][f"FC{i}"]["kernel"])
            bs.append(tree[group][f"FC{i}"]["bias"])
    return ks, bs


def pack_mlp_state(state: TrainState, enc_dims, dec_dims, tdv: bool,
                   dual: bool = False):
    n_enc, n_dec = len(enc_dims), len(dec_dims)
    shapes = _padded_layer_shapes(enc_dims, dec_dims, dual)
    adam = _adam_state(state.opt_state)

    def pack_tree(tree):
        ks, bs = _collect_layers(tree, n_enc, n_dec, dual)
        ws = [_pack_mat(shapes[i], ks[i]) for i in range(len(ks))]
        bbs = []
        for i, b in enumerate(bs):
            buf = jnp.zeros((1, shapes[i][1]), jnp.float32)
            bbs.append(buf.at[0, : b.shape[0]].set(b))
        vec = jnp.zeros((8, LANE), jnp.float32)
        vec = vec.at[2, : tree["epsilon_p"].shape[0]].set(tree["epsilon_p"])
        if tdv:
            vec = vec.at[3, 0].set(tree["epsilon"][0])
        return ws, bbs, vec

    pw, pb, pvec = pack_tree(state.params)
    mw, mb, mvec = pack_tree(adam.mu)
    vw, vb, vvec = pack_tree(adam.nu)
    return (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec)


def unpack_mlp_state(state: TrainState, packed, n_steps, enc_dims, dec_dims,
                     tdv: bool, latent_dim: int,
                     dual: bool = False) -> TrainState:
    n_enc, n_dec = len(enc_dims), len(dec_dims)
    all_dims = _all_layer_dims(enc_dims, dec_dims, dual)
    adam = _adam_state(state.opt_state)
    (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec) = packed

    def unpack_tree(ws, bs, vec, template):
        out = dict(template)
        li = 0
        for group, count in _layer_groups(n_enc, n_dec, dual):
            layers = dict(out[group])
            for i in range(count):
                din, dout = all_dims[li]
                layers[f"FC{i}"] = {
                    "kernel": ws[li][:din, :dout],
                    "bias": bs[li][0, :dout],
                }
                li += 1
            out[group] = layers
        out["epsilon_p"] = vec[2, :latent_dim]
        if tdv:
            out["epsilon"] = vec[3, 0:1]
        return out

    params = unpack_tree(pw, pb, pvec, state.params)
    mu = unpack_tree(mw, mb, mvec, adam.mu)
    nu = unpack_tree(vw, vb, vvec, adam.nu)
    new_count = adam.count + n_steps

    def rebuild(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=new_count, mu=mu, nu=nu)
        return s

    opt_state = jax.tree_util.tree_map(
        rebuild, state.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    return state.replace(params=params, opt_state=opt_state,
                         step=state.step + n_steps)


def run_mlp_fused_chunk(
    *,
    n_steps: int,
    seed_and_t0: jax.Array,
    a_t: jax.Array,
    packed,
    batch: int,
    data_dim: int,
    latent_dim: int,
    enc_dims,
    dec_dims,
    dataset_kind: str,
    intrinsic_dim: int,
    var_added: float,
    eps_const: float,
    tdv: bool,
    lr: float,
    external_noise=None,
    interpret: bool = False,
    grid_n: int = 0,
    dual: bool = False,
    fp32_dots: bool = False,
    packed_noise: bool | None = None,
    external_raw_noise=None,
    adam_l0: Tuple[int, int] | None = None,
):
    # packed_noise=None (auto) enables the packed in-kernel noise draw when
    # every static dim fits a half-lane window; MIXED-dimension grid callers
    # must decide from the max over their rows and pass the bool explicitly
    # (the static dims here describe only row 0's layout).
    # external_raw_noise=(A, B) is the raw-pair test hook that runs the
    # PACKED window derivation on caller-supplied blocks. See
    # linear_vae.run_fused_chunk for the full contract of both.
    # adam_l0=(data_in, latent_in) bounds the FIRST layers' Adam live rows;
    # mixed-dimension grid callers pass the max over their rows (same
    # contract as linear_vae's adam_rows).
    raw = external_raw_noise is not None
    if raw:
        if external_noise is not None:
            raise ValueError("external_raw_noise excludes external_noise")
        if not packed_noise_ok(data_dim, latent_dim, intrinsic_dim):
            raise ValueError("external_raw_noise needs packed-eligible dims")
        a_blk, b_blk = external_raw_noise
        external_noise = (a_blk, b_blk, jnp.zeros_like(a_blk))
        packed_noise = True
    elif packed_noise is None:
        # conservative in grid mode — static dims describe only row 0
        # (see linear_vae.run_fused_chunk); grid callers opt in explicitly
        packed_noise = (grid_n == 0 and
                        packed_noise_ok(data_dim, latent_dim, intrinsic_dim))
    packed_noise = packed_noise and (raw or external_noise is None)
    if adam_l0 is None:
        adam_l0 = ((enc_dims[0][0], dec_dims[0][0]) if grid_n == 0
                   else (LANE, LANE))
    l0_in_rows = (((adam_l0[0] + 7) // 8) * 8, ((adam_l0[1] + 7) // 8) * 8)
    kernel = _make_kernel(
        n_steps=n_steps, batch=batch, data_dim=data_dim,
        latent_dim=latent_dim, enc_dims=list(enc_dims), dec_dims=list(dec_dims),
        dataset_kind=dataset_kind, intrinsic_dim=intrinsic_dim,
        var_added=var_added, eps_const=eps_const, tdv=tdv, lr=lr,
        external_noise=external_noise is not None, grid=grid_n > 0,
        dual=dual, fp32_dots=fp32_dots, packed_noise=packed_noise,
        raw_noise=raw, l0_in_rows=l0_in_rows,
    )
    (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec) = packed
    state_arrays = [*pw, *pb, pvec, *mw, *mb, mvec, *vw, *vb, vvec]
    state_shapes = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in state_arrays]
    n_steps_pad = ((n_steps + 7) // 8) * 8 if grid_n else n_steps
    loss_shape = ((grid_n * n_steps_pad, 1) if grid_n else (n_steps, 1))
    out_shapes = tuple(state_shapes) + (
        jax.ShapeDtypeStruct(loss_shape, jnp.float32),
    )
    inputs = [a_t, *state_arrays]
    if external_noise is not None:
        inputs += list(external_noise)
    n_state = len(state_arrays)
    # flattened input indices: 0 seed, 1 a_t, 2.. state buffers
    aliases = {j + 2: j for j in range(n_state)}
    if grid_n:
        # grid mode: arrays carry a leading seed axis; one block per seed
        def spec_for(shape):
            return pl.BlockSpec(
                (1,) + shape, lambda i, *_: (i,) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        in_specs = [spec_for(a_t.shape[1:])]
        in_specs += [spec_for(s.shape[1:]) for s in state_shapes]
        if external_noise is not None:
            # test hook: per-seed noise streams, (1, n_steps, rows, LANE)
            in_specs += [spec_for(noise.shape[1:]) for noise in external_noise]
        loss_spec = pl.BlockSpec(
            (n_steps_pad, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        out_specs = tuple(
            [spec_for(s.shape[1:]) for s in state_shapes] + [loss_spec])
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_specs,
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=tuple(
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + 1)),
        )
    flops = sum(2 * pad_dim(i) * pad_dim(o) * pad_dim(batch) * 3
                for i, o in _all_layer_dims(enc_dims, dec_dims, dual))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops * n_steps,
            bytes_accessed=sum(a.size for a in state_arrays) * 4 + n_steps * 4,
            transcendentals=(5 if packed_noise else 10) * LANE * LANE * n_steps,
        ),
    )(seed_and_t0, *inputs)
    new_state_arrays, losses = out[:n_state], out[n_state][:, 0]
    if grid_n:
        losses = losses.reshape(grid_n, n_steps_pad)[:, :n_steps]
    n_w = len(pw)
    new_packed = (
        list(new_state_arrays[0: n_w]),
        list(new_state_arrays[n_w: 2 * n_w]),
        new_state_arrays[2 * n_w],
        list(new_state_arrays[2 * n_w + 1: 3 * n_w + 1]),
        list(new_state_arrays[3 * n_w + 1: 4 * n_w + 1]),
        new_state_arrays[4 * n_w + 1],
        list(new_state_arrays[4 * n_w + 2: 5 * n_w + 2]),
        list(new_state_arrays[5 * n_w + 2: 6 * n_w + 2]),
        new_state_arrays[6 * n_w + 2],
    )
    return new_packed, losses


# ---------------------------------------------------------------------------
# StepFns integration
# ---------------------------------------------------------------------------


def mlp_pallas_supported(model, dataset, cfg, grid_over_mesh: bool = False,
                         interpret: bool = False) -> Tuple[bool, str]:
    """``interpret=True`` skips the backend check — see
    linear_vae.pallas_supported."""
    from ..data.synthetic import (
        LinearGaussianDataset,
        SigmoidDataset,
        SphereDataset,
    )

    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False, f"backend {jax.default_backend()!r} is not a TPU"
    if isinstance(dataset, SphereDataset):
        if dataset.padding_dim + dataset.dim > LANE:
            return False, "ambient dim too large"
        if model.dual_sigmoid_decoder:
            return False, "dual decoder expects the sigmoid dataset"
    elif isinstance(dataset, LinearGaussianDataset):
        if dataset.dimension > LANE or dataset.intrinsic_dim > LANE:
            return False, "dims too large"
        if model.dual_sigmoid_decoder:
            return False, "dual decoder expects the sigmoid dataset"
    elif isinstance(dataset, SigmoidDataset):
        if not model.dual_sigmoid_decoder:
            return False, "sigmoid dataset expects the dual decoder"
        if dataset.dimension > LANE:
            return False, "ambient dim too large"
    else:
        return False, "MLP kernel supports sphere, linear_gaussian, sigmoid"
    if len(model.encoder_features) < 2 and len(model.decoder_features) < 2:
        return False, "pure-linear configs use the linear kernel"
    if cfg.batch_size > LANE:
        return False, f"batch_size must be <= {LANE}"
    if model.latent_dim > LANE or dataset.dimension > LANE:
        return False, "latent/data dims too large"
    if any(pad_dim(f) > 512 for f in model.encoder_features
           + model.decoder_features):
        return False, "hidden layers too wide for VMEM residency"
    if cfg.mesh and not grid_over_mesh:
        return False, ("mesh training uses the XLA path (to use the fused "
                       "kernels multi-chip, shard a seed grid: "
                       "--seed_grid ... --mesh dp=N)")
    return True, "ok"


@lru_cache(maxsize=64)
def _shared_mlp_chunk_fn(batch, data_dim, latent_dim, enc_dims, dec_dims,
                         dataset_kind, intrinsic_dim, var_added, eps_const,
                         tdv, lr, dual=False, fp32_dots=False):
    """One jitted chunk fn per static config, shared across dataset seeds
    (the manifold matrix is a runtime argument)."""
    enc_dims, dec_dims = list(enc_dims), list(dec_dims)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("state",))
    def train_chunk(a_t, state: TrainState, n_steps: int):
        packed = pack_mlp_state(state, enc_dims, dec_dims, tdv, dual=dual)
        new_packed, losses = run_mlp_fused_chunk(
            n_steps=n_steps,
            seed_and_t0=chunk_seed_and_t0(state),
            a_t=a_t,
            packed=packed,
            batch=batch,
            data_dim=data_dim,
            latent_dim=latent_dim,
            enc_dims=enc_dims,
            dec_dims=dec_dims,
            dataset_kind=dataset_kind,
            intrinsic_dim=intrinsic_dim,
            var_added=var_added,
            eps_const=eps_const,
            tdv=tdv,
            lr=lr,
            dual=dual,
            fp32_dots=fp32_dots,
        )
        new_state = unpack_mlp_state(
            state, new_packed, n_steps, enc_dims, dec_dims, tdv, latent_dim,
            dual=dual,
        )
        return new_state, losses

    return train_chunk


def make_mlp_pallas_step_fns(model, dataset, tx, cfg) -> StepFns:
    from .linear_vae import manifold_rows

    data_dim = dataset.dimension
    latent_dim = model.latent_dim
    tdv = model.tunable_decoder_var
    dual = model.dual_sigmoid_decoder
    enc_dims = _layer_dims(model.encoder_features, data_dim)
    dec_dims = _layer_dims(model.decoder_features, latent_dim)
    dataset_kind, var_added, intrinsic_dim, a_t_rows = manifold_rows(
        [dataset], size=LANE)
    a_t = a_t_rows[0]

    base = make_step_fns(model, dataset, tx, cfg.batch_size)
    shared = _shared_mlp_chunk_fn(
        cfg.batch_size, data_dim, latent_dim,
        tuple(map(tuple, enc_dims)), tuple(map(tuple, dec_dims)),
        dataset_kind, intrinsic_dim, float(var_added), float(model.epsilon),
        tdv, float(cfg.learning_rate), dual,
        getattr(cfg, "precision", "bf16") == "fp32",
    )

    def train_chunk(state: TrainState, n_steps: int):
        return shared(a_t, state, n_steps)

    return StepFns(
        train_chunk=train_chunk,
        eval_loss=base.eval_loss,
        generate=base.generate,
        score=base.score,
        loss_and_grads=base.loss_and_grads,
        eval_step=base.eval_step,
        place_state=None,
    )
