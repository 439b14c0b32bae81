"""Pallas TPU kernel: the ENTIRE multi-step linear-VAE training loop fused.

For the pure-linear sweep configs (0-hidden-layer encoder/decoder,
/root/reference/seed_linpadding_expts.sh, sigmoid script's net shapes), one
``pallas_call`` runs K training steps with every parameter, Adam moment, and
activation resident in VMEM:

    per step (all in-kernel):
      TPU PRNG → Box-Muller normals → manifold sample x = n·Aᵀ
      → encoder mu = x·We + be → reparam s = mu + e^{ep/2}·z1
      → decoder y = s·Wd + bd + z2·e^{ε/2}
      → closed-form ELBO + hand-derived analytic backward
      → Adam update (bias-corrected, matching optax.adam)

Zero HBM traffic per step beyond the (K,1) loss trace: the state makes one
round trip per chunk (input_output_aliases), not per step. This is the
speed-of-light version of the reference hot loop — the math is identical to
/root/reference/networks.py:87-101 (verified against the XLA path by the
``external noise`` test mode, see tests/test_pallas_kernel.py).

Padding scheme: everything is embedded in 128-lane tiles (N=128). Padded
regions of parameters start at zero and PROVABLY stay zero: every gradient
expression vanishes on padded rows/cols given masked noise (z1 masked to
latent cols, z2 to data cols, batch rows masked), so Adam never moves them.
The ELBO constant 0.5·D·(log2π+ε) is added analytically since the padded
reconstruction residual is zero by construction.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..train.state import TrainState
from ..train.step import StepFns, make_step_fns

N = 128  # lane tile; all dims embedded into (N, N) / (8, N) buffers
# Adam hyperparameters shared with the XLA path (see train/state.make_adam).
from ..train.state import ADAM_B1 as B1, ADAM_B2 as B2, ADAM_EPS  # noqa: E402

LOG_2PI = math.log(2.0 * math.pi)


def chunk_seed_and_t0(state: "TrainState") -> jax.Array:
    """(2,) int32 [PRNG seed, Adam step] for one fused chunk — derived from
    the state's fold_in(step) key streams so resume stays bit-exact. The
    SINGLE definition used by every kernel path (solo and grid).

    Seed construction: the low words of the two folded threefry keys are
    xor-combined and shifted to a 31-bit non-negative int32. Collision
    argument (grid mode gives every row its own seed this way): threefry
    key words are uniform, so two rows collide with p = 2^-31 per pair;
    a full mixed launch (≤21 rows, 210 pairs) collides with p ≈ 1e-7 per
    chunk, and seeds are RE-derived from fold_in(step) every chunk, so a
    collision costs one chunk of shared noise between two rows (a
    statistical blemish for that pair, not a correctness failure) and
    does not persist. Validated empirically by tools/check_kernel_rng.py
    (cross-row stream battery: pairwise correlations of streams drawn
    from ACTUAL grid-derived seeds)."""
    k1 = jax.random.fold_in(state.data_key, state.step)
    k2 = jax.random.fold_in(state.model_key, state.step)
    seed = ((k1[1] ^ k2[1]) >> jnp.uint32(1)).astype(jnp.int32)
    t0 = _adam_state(state.opt_state).count.astype(jnp.int32)
    return jnp.stack([seed, t0])


@partial(jax.jit, static_argnums=(1, 2))
def _sigmoid_a_t_rows(A, dim: int, size: int):
    def one(a):
        return jnp.zeros((size, size), jnp.float32).at[:dim, dim].set(a[:, 0])

    return jax.vmap(one)(A)


@partial(jax.jit, static_argnums=(1,))
def _linear_a_t_rows(A, size: int):
    return jax.vmap(lambda a: _pack_mat((size, size), a.T))(A)


def manifold_rows(datasets, size: int = N):
    """Stacked per-row manifold matrices + kernel dataset metadata for a
    grid launch: ``(dataset_kind, var_added, intrinsic_dim, a_t)``.

    The SINGLE definition of the kernels' a_t packing contract (linear →
    A.T rows; sigmoid → A's column at [:, dim] so the matmul lands the
    σ-logit in the σ-coordinate column; sphere → unused zeros), shared by
    every grid/mixed launch path. Callers gate kernel eligibility via
    pallas_supported/mlp_pallas_supported first. Packing is jitted per
    GROUP shape (one compiled call per row group), not eager per dataset —
    eager per-dataset `.at[].set` chains cost a remote compile per
    primitive on the tunnel runtime and dominated sweep startup."""
    from ..data.synthetic import SigmoidDataset, SphereDataset

    d0 = datasets[0]
    if isinstance(d0, SphereDataset):
        a_t = jnp.zeros((len(datasets), size, size), jnp.float32)
        return "sphere", 0.0, d0.dim, a_t
    if isinstance(d0, SigmoidDataset):
        A = jnp.stack([d.A for d in datasets])
        return "sigmoid", 0.0, d0.dim, _sigmoid_a_t_rows(A, d0.dim, size)
    A = jnp.stack([d.A for d in datasets])
    return "linear", d0.var_added, d0.intrinsic_dim, _linear_a_t_rows(A, size)


def grid_seed_rows(state_grid, data_dims, latent_dims, intrinsic_dims):
    """(grid_n, 5) int32 scalar-prefetch rows for the GRID kernel:
    [seed, t0, data_dim, latent_dim, intrinsic_dim] per row. Dims ride the
    scalar-prefetch buffer so rows with DIFFERENT dimensions (the mixed
    linear sweep: dd 3..12, ld 10/20) train in ONE pallas launch — the
    kernel builds its masks from these scalars instead of Python constants."""
    seeds = jax.vmap(chunk_seed_and_t0)(state_grid)  # (n, 2)
    n = seeds.shape[0]

    def col(v):
        arr = jnp.asarray(v, jnp.int32).reshape(-1)
        return jnp.broadcast_to(arr, (n,)) if arr.shape[0] == 1 else arr

    dims = jnp.stack(
        [col(data_dims), col(latent_dims), col(intrinsic_dims)], axis=1
    )
    return jnp.concatenate([seeds, dims], axis=1)

# vec-buffer row layout: packed small parameters, one Adam update for all
ROW_BE, ROW_BD, ROW_EP, ROW_EPS, ROW_BS = 0, 1, 2, 3, 4


def _uniform(shape):
    """PRNG bits → uniform(0,1) float32, strictly inside (0,1)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 24 bits fit in int32, which Mosaic can cast to f32 (uint32 can't)
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
    # (u + 0.5) / 2^24 ∈ (0, 1)
    return (u + 0.5) * (1.0 / 16777216.0)


def _normal_block(rows: int = N):
    """(rows, N) standard normals via Box-Muller on the in-kernel PRNG."""
    u1 = _uniform((rows, N))
    u2 = _uniform((rows, N))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def _normal_block_pair(rows: int = N):
    """TWO (rows, N) normal blocks from ONE Box-Muller transform (cos & sin
    partners share the radius), halving the PRNG + transcendental cost."""
    u1 = _uniform((rows, N))
    u2 = _uniform((rows, N))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = 2.0 * jnp.pi * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _col_mask(width: int):
    c = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    return (c < width).astype(jnp.float32)


def _row_mask(height: int, rows: int = N):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    return (r < height).astype(jnp.float32)


def row_tile(batch: int) -> int:
    """Smallest 8-aligned row count covering the batch (f32 sublane tile),
    capped at N. Activations/noise use (rows, N) blocks instead of (N, N):
    VPU + PRNG work scales with rows/N."""
    return min(N, ((batch + 7) // 8) * 8)


def packed_noise_ok(*dims: int) -> bool:
    """True when every dim fits a half-lane window, i.e. the packed
    in-kernel noise draw (one Box-Muller pair per step supplying all four
    noise consumers from disjoint lane windows — see _make_kernel) keeps
    its windows non-overlapping. The single gate used by every caller:
    solo/uniform-grid launches pass their static dims; MIXED-dimension
    grid launches must pass the dims of EVERY row."""
    return max(dims) <= N // 2


def _adam(p, m, v, g, t, lr):
    """optax.adam's update with the bias corrections folded into per-step
    SCALARS: mh/(sqrt(vh)+eps) == m·√bc2/bc1 / (sqrt(v) + eps·√bc2) with
    bc_i = 1−βᵢ^t — algebraically identical, but the two per-ELEMENT
    divisions become one scalar multiply each (measured −361 ns/step on
    the Adam-bound MLP kernel). m/v are bitwise-identical to optax;
    p differs from the unfolded form only by regrouped rounding (the
    equivalence suite pins p against jax.grad+optax to float tolerance).

    bf16 moments (--adam_dtype bf16): when m/v arrive as bfloat16 buffers,
    compute stays f32 and each step's m/v are rounded back to bf16, with
    the ROUNDED values feeding the parameter update — the exact contract of
    train/state._scale_by_adam_bf16, so kernel and XLA paths stay bitwise-
    equal on the moments. Halves the Adam VMEM load/store traffic that
    bounds the fused MLP step (docs/architecture.md)."""
    mdt = m.dtype
    if mdt != jnp.float32:
        m = m.astype(jnp.float32)
        v = v.astype(jnp.float32)
    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * g * g
    if mdt != jnp.float32:
        m = m.astype(mdt)
        v = v.astype(mdt)
        m32 = m.astype(jnp.float32)
        v32 = v.astype(jnp.float32)
    else:
        m32, v32 = m, v
    bc2_sqrt = jnp.sqrt(1.0 - jnp.exp(t * math.log(B2)))
    lr_t = lr * bc2_sqrt / (1.0 - jnp.exp(t * math.log(B1)))
    return p - lr_t * m32 / (jnp.sqrt(v32) + ADAM_EPS * bc2_sqrt), m, v


def _make_kernel(
    *,
    n_steps: int,
    batch: int,
    data_dim: int,
    latent_dim: int,
    intrinsic_dim: int,
    var_added: float,
    eps_const: float,
    tdv: bool,
    lr: float,
    external_noise: bool,
    dataset_kind: str = "linear",  # "linear" | "sigmoid"
    dual: bool = False,  # dual sigmoid+plain decoder (sigmoid configs)
    grid: bool = False,  # one grid step per sweep seed (blocks have lead dim 1)
    fp32_dots: bool = False,  # Precision.HIGHEST matmuls (--precision fp32)
    packed_noise: bool = False,  # one Box-Muller pair feeds ALL noise lanes
    raw_noise: bool = False,  # external blocks are the RAW Box-Muller pair
    we_rows: int = N,  # 8-aligned live-row bound of We (>= every data_dim)
    wd_rows: int = N,  # 8-aligned live-row bound of Wd/Ws (>= every latent)
):
    """Build the kernel body. ``external_noise`` replaces the in-kernel PRNG
    with caller-supplied noise blocks — the test hook that lets the math be
    compared against the XLA train step exactly.

    ``raw_noise=True`` (requires ``external_noise`` and ``packed_noise``)
    feeds the PACKED derivation from caller-supplied raw normal blocks
    instead of the PRNG: the first two noise buffers are the per-step
    Box-Muller pair (A, B) and the packed lane-window arithmetic (rolls,
    masks) runs verbatim — the test hook that pins the packed branch's
    window math on CPU, where the in-kernel PRNG can't run
    (tests/test_pallas_kernel.py::test_packed_windows_match_xla_math).

    ``dataset_kind='sigmoid'`` samples Y = [z, σ(z·A), 0-pad] in-kernel
    (/root/reference/datasets.py:240-249); ``dual=True`` adds the sigmoid
    decoder head x̂ = σ(s·Ws + bs) + s·Wd + bd
    (/root/reference/networks.py:75-78) with its analytic backward.

    ``grid=True`` runs one SWEEP SEED per pallas grid step: every buffer
    gains a leading axis of size n_seeds in HBM and each grid step's blocks
    (lead dim 1) are streamed into VMEM by the BlockSpec machinery — the
    whole multi-seed sweep becomes one kernel launch. External noise works
    in grid mode too (noise buffers carry the same leading seed axis), so
    the multi-seed path is pinned to the solo kernel and the XLA/optax
    reference by the same equivalence tests
    (tests/test_grid_kernel_equivalence.py).
    """
    if batch > N:
        raise ValueError(f"fused kernel supports batch <= {N}, got {batch}")
    inv_b = 1.0 / batch
    # activation/noise blocks span only the batch's 8-aligned row tile —
    # in BOTH production and external-noise (test) modes, so the
    # math-equivalence suite exercises the tiled path
    rows = row_tile(batch)

    def kernel(seed_ref, *refs):
        if external_noise:
            (at_ref, we_ref, wd_ref, ws_ref, vec_ref,
             mwe_ref, vwe_ref, mwd_ref, vwd_ref, mws_ref, vws_ref,
             mvec_ref, vvec_ref, xn_ref, z1n_ref, z2n_ref,
             we_out, wd_out, ws_out, vec_out,
             mwe_out, vwe_out, mwd_out, vwd_out, mws_out, vws_out,
             mvec_out, vvec_out, loss_ref) = refs
        else:
            (at_ref, we_ref, wd_ref, ws_ref, vec_ref,
             mwe_ref, vwe_ref, mwd_ref, vwd_ref, mws_ref, vws_ref,
             mvec_ref, vvec_ref,
             we_out, wd_out, ws_out, vec_out,
             mwe_out, vwe_out, mwd_out, vwd_out, mws_out, vws_out,
             mvec_out, vvec_out, loss_ref) = refs
            if grid:
                pltpu.prng_seed(seed_ref[pl.program_id(0), 0])
            else:
                pltpu.prng_seed(seed_ref[0])

        if grid:
            # per-row scalars: [seed, t0, data_dim, latent_dim, intrinsic].
            # Dims ride the scalar-prefetch buffer so MIXED-dimension rows
            # share one launch; masks below are built from them at runtime.
            pid = pl.program_id(0)
            t0 = seed_ref[pid, 1].astype(jnp.float32)
            dd_i, ld_i, id_i = seed_ref[pid, 2], seed_ref[pid, 3], seed_ref[pid, 4]
            ld = lambda r: r[0]  # blocks carry a leading seed axis of 1
            ldn = lambda r, i: r[0, i]  # noise: (1, n_steps, rows, N) block
        else:
            t0 = seed_ref[1].astype(jnp.float32)
            dd_i, ld_i, id_i = data_dim, latent_dim, intrinsic_dim
            ld = lambda r: r[:]
            ldn = lambda r, i: r[i]
        # (N, N) manifold matrix: linear → A.T at [:intrinsic, :dim];
        # sigmoid → A's column at [:dim, dim] so n·a_t lands σ's logit in
        # the σ-coordinate column.
        a_t = ld(at_ref)

        dd_f = jnp.asarray(dd_i).astype(jnp.float32)
        lat_m = _col_mask(ld_i)
        dat_m = _col_mask(dd_i)
        int_m = _col_mask(id_i)
        row_m = _row_mask(batch, rows)
        if dataset_kind == "sigmoid":
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
            sig_col_m = (col_ids == id_i).astype(jnp.float32)

        # --precision: None = MXU-native single-pass bf16 operands (the
        # default for f32 dots on TPU); HIGHEST = true-fp32 matmuls. See
        # mlp_vae.py for the full rationale; CPU interpret (the equivalence
        # suite) is exact fp32 in both modes.
        prec = jax.lax.Precision.HIGHEST if fp32_dots else None

        # combined column×row masks, hoisted out of the step loop: one VPU
        # multiply per noise consumer instead of two. Bitwise-safe — masks
        # are exactly 0.0/1.0, so the product order cannot round. The var
        # scale folds into its mask the same way (0·c and 1·c are exact).
        latrow_m = lat_m * row_m
        datrow_m = dat_m * row_m
        if dataset_kind == "linear" and var_added > 0.0:
            var_m = datrow_m * math.sqrt(var_added)

        def manifold_x(n_int):
            if dataset_kind == "sigmoid":
                logit = jnp.dot(n_int, a_t,
                                preferred_element_type=jnp.float32, precision=prec)
                return n_int + jax.nn.sigmoid(logit) * sig_col_m
            return jnp.dot(n_int, a_t,
                           preferred_element_type=jnp.float32, precision=prec)

        def packed_sample(n_raw, z1_raw):
            # Packed mode: ONE Box-Muller pair supplies every noise
            # consumer. Lanes of a normal block are iid, so disjoint lane
            # windows are independent draws: the manifold reads the UPPER
            # half of block A (repositioned by a static half-width lane
            # roll — one VPU rotate), z2 the lower half of A, z1 the lower
            # half of B, and the observation noise the upper half of B.
            # Statistics are unchanged while the per-step PRNG +
            # transcendental work — the dominant non-MXU cost of this
            # kernel (docs/architecture.md) — halves. Callers gate on every
            # dim <= N // 2 so the windows never overlap. This derivation
            # is shared by the production path and the raw_noise test hook.
            n_int = pltpu.roll(n_raw, shift=N // 2, axis=1) * int_m
            x = manifold_x(n_int) * row_m
            z1 = z1_raw * latrow_m
            z2 = n_raw * datrow_m
            if dataset_kind == "linear" and var_added > 0.0:
                var_blk = pltpu.roll(z1_raw, shift=N // 2, axis=1)
                x = x + var_blk * var_m
            return x, z1, z2

        # Adam live-row slicing: weight rows beyond the data/latent dims
        # carry zero params, zero moments, and provably-zero gradients, so
        # their Adam update is the identity — the loop carries only the
        # live 8-aligned row slices (wb rows of We, lb of Wd/Ws) and the
        # elementwise Adam work shrinks ~3x. The dots still need full
        # (N, N) operands; _full() reassembles them from the live slice +
        # a zeros block (cheap stores vs ~12 Adam ops per skipped row).
        # Bitwise-exact: x/z1 lanes beyond the dims are masked to zero, so
        # 0-row weights contribute exact zeros to every contraction.
        wb, lb = we_rows, wd_rows
        sb = lb if dual else N  # Ws is live only in dual mode

        def _full(p, b):
            if b >= N:
                return p
            return jnp.concatenate(
                [p, jnp.zeros((N - b, N), jnp.float32)], axis=0)

        def body(i, carry):
            (we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws,
             mvec, vvec) = carry
            we_f, wd_f, ws_f = _full(we, wb), _full(wd, lb), _full(ws, sb)
            t = t0 + i.astype(jnp.float32) + 1.0

            # --- sample (on-device dataset + prior noise) ---------------
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
                n_int = n_raw * int_m
                x = manifold_x(n_int) * row_m
                z1 = z1_raw * latrow_m
                if dataset_kind == "linear" and var_added > 0.0:
                    # pair z2 with the observation noise: one transform
                    z2_raw, var_raw = _normal_block_pair(rows)
                    x = x + var_raw * var_m
                    z2 = z2_raw * datrow_m
                else:
                    z2 = _normal_block(rows) * datrow_m

            be = vec[ROW_BE:ROW_BE + 1, :]
            bd = vec[ROW_BD:ROW_BD + 1, :]
            ep = vec[ROW_EP:ROW_EP + 1, :] * lat_m
            if tdv:
                eps = vec[ROW_EPS, 0] * eps_const
            else:
                eps = jnp.float32(eps_const)

            # --- forward -------------------------------------------------
            mu = jnp.dot(x, we_f, preferred_element_type=jnp.float32, precision=prec) + be
            mu = mu * row_m  # padded batch rows see bias; mask them out
            sdev = jnp.exp(ep * 0.5) * lat_m  # e^{ep/2} on live cols, 0 pad
            s = mu + sdev * z1
            y = jnp.dot(s, wd_f, preferred_element_type=jnp.float32, precision=prec) + bd
            if dual:
                u = jnp.dot(s, ws_f, preferred_element_type=jnp.float32, precision=prec) + bs_row(vec)
                sig_u = jax.nn.sigmoid(u)
                # mask: padded output cols would otherwise get σ(0)=0.5
                y = y + sig_u * dat_m
            y = (y + z2 * jnp.exp(eps * 0.5)) * row_m
            r = y - x
            inv_var = jnp.exp(-eps)

            # --- loss (matches networks.py:94-98) ------------------------
            kl_vec = -0.5 * (1.0 + ep - jnp.exp(ep)) * lat_m  # (1, N)
            kl_const = jnp.sum(kl_vec)
            sum_mu2 = jnp.sum(mu * mu)
            sum_r2 = jnp.sum(r * r)
            # structured as dd_f · (0.5·(log2π+ε)) so the solo (static dd)
            # and grid (scalar-prefetched dd) paths compute bitwise-equal
            # constants
            mse_const = dd_f * (0.5 * (LOG_2PI + eps))
            loss = (kl_const + 0.5 * inv_b * sum_mu2
                    + 0.5 * inv_var * inv_b * sum_r2 + mse_const)
            # identical 2-D store in both modes: grid mode gives each seed
            # its own (n_steps, 1) block of a flattened loss buffer (a 3-D
            # block with dynamic middle index lowers pathologically)
            loss_ref[pl.ds(i, 1), :] = loss.reshape(1, 1)

            # --- analytic backward ---------------------------------------
            g_y = r * (inv_var * inv_b)  # row-masked via r
            # g_Wd = sᵀ·g_y ; g_We = xᵀ·g_mu  (contract the batch dim)
            g_wd = jax.lax.dot_general(
                s, g_y, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            g_bd = jnp.sum(g_y, axis=0, keepdims=True)
            # g_s = g_y·Wdᵀ (contract data dim)
            g_s = jax.lax.dot_general(
                g_y, wd_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if dual:
                g_u = g_y * sig_u * (1.0 - sig_u) * dat_m
                g_ws = jax.lax.dot_general(
                    s, g_u, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                g_bs = jnp.sum(g_u, axis=0, keepdims=True)
                g_s = g_s + jax.lax.dot_general(
                    g_u, ws_f, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
            else:
                g_ws = jnp.zeros((N, N), jnp.float32)
                g_bs = jnp.zeros((1, N), jnp.float32)
            g_mu = g_s + mu * inv_b
            g_we = jax.lax.dot_general(
                x, g_mu, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            g_be = jnp.sum(g_mu, axis=0, keepdims=True)
            g_ep = (jnp.sum(g_s * z1, axis=0, keepdims=True) * 0.5 * sdev
                    + 0.5 * (jnp.exp(ep) - 1.0) * lat_m)
            if tdv:
                g_eps = (-0.5 * inv_var * inv_b * sum_r2
                         + 0.5 * dd_f
                         + jnp.sum(g_y * z2) * 0.5 * jnp.exp(eps * 0.5))
                g_eps_s = g_eps * eps_const
                col0 = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) == 0)
                g_eps_row = jnp.where(col0, g_eps_s, 0.0)
            else:
                g_eps_row = jnp.zeros((1, N), jnp.float32)
            g_vec = jnp.concatenate(
                [g_be, g_bd, g_ep, g_eps_row, g_bs,
                 jnp.zeros((3, N), jnp.float32)],
                axis=0)

            # --- Adam (optax.adam formula), live rows only -----------------
            we, mwe, vwe = _adam(we, mwe, vwe, g_we[:wb], t, lr)
            wd, mwd, vwd = _adam(wd, mwd, vwd, g_wd[:lb], t, lr)
            if dual:
                ws, mws, vws = _adam(ws, mws, vws, g_ws[:sb], t, lr)
            vec, mvec, vvec = _adam(vec, mvec, vvec, g_vec, t, lr)
            return we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec

        ins = (we_ref, wd_ref, ws_ref, vec_ref, mwe_ref, vwe_ref,
               mwd_ref, vwd_ref, mws_ref, vws_ref, mvec_ref, vvec_ref)
        # live-row bound per carry slot (N = carry the full buffer)
        bounds = (wb, lb, sb, N, wb, wb, lb, lb, sb, sb, N, N)
        init = tuple(ld(r)[:b] if b < N else ld(r)
                     for r, b in zip(ins, bounds))
        out = jax.lax.fori_loop(0, n_steps, body, init)
        outs = (we_out, wd_out, ws_out, vec_out, mwe_out, vwe_out,
                mwd_out, vwd_out, mws_out, vws_out, mvec_out, vvec_out)
        for dst, val, b in zip(outs, out, bounds):
            if b < N:
                # rows beyond the live bound are zero by the padding
                # invariant (asserted by test_padded_regions_stay_zero)
                val = jnp.concatenate(
                    [val, jnp.zeros((N - b, N), val.dtype)], axis=0)
            if grid:
                dst[0] = val
            else:
                dst[:] = val

    return kernel


def bs_row(vec):
    return vec[ROW_BS:ROW_BS + 1, :]


N_STATE_BUFFERS = 12  # we, wd, ws, vec, + adam m/v for each


def run_fused_chunk(
    *,
    n_steps: int,
    seed_and_t0: jax.Array,  # solo: (2,) int32; grid: (grid_n, 5) int32
    a_t: jax.Array,  # (N, N)
    buffers,  # 12-tuple: we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec
    batch: int,
    data_dim: int,
    latent_dim: int,
    intrinsic_dim: int,
    var_added: float,
    eps_const: float,
    tdv: bool,
    lr: float,
    dataset_kind: str = "linear",
    dual: bool = False,
    external_noise: Tuple[jax.Array, jax.Array, jax.Array] | None = None,
    interpret: bool = False,
    grid_n: int = 0,
    fp32_dots: bool = False,
    packed_noise: bool | None = None,
    external_raw_noise: Tuple[jax.Array, jax.Array] | None = None,
    adam_rows: Tuple[int, int] | None = None,
):
    """Invoke the fused kernel for one chunk. Returns (new_buffers, losses).

    ``grid_n > 0`` = multi-seed mode: every buffer (and the manifold matrix)
    carries a leading axis of size grid_n; one pallas grid step trains one
    seed, its state blocks streamed HBM→VMEM by BlockSpec. ``seed_and_t0``
    rows are ``[seed, t0, data_dim, latent_dim, intrinsic_dim]``
    (see grid_seed_rows): dims are scalar-prefetched per row, so rows with
    DIFFERENT dimensions train in the same launch — the ``data_dim``/
    ``latent_dim``/``intrinsic_dim`` arguments are ignored by grid-mode
    masks (they still describe the host-side pack/unpack layout).

    ``packed_noise=None`` (auto) enables the packed in-kernel noise draw
    (one Box-Muller pair per step — see _make_kernel) whenever every static
    dim fits a half-lane window; MIXED-dimension grid callers must decide
    from the max over their rows and pass the bool explicitly, because the
    static args here describe only row 0's layout.

    ``external_raw_noise=(A, B)`` — test hook: the two buffers are the raw
    per-step Box-Muller pair and the kernel runs the PACKED lane-window
    derivation on them verbatim (see _make_kernel ``raw_noise``), so the
    packed branch's window arithmetic is pinnable on CPU interpret, where
    the in-kernel PRNG can't execute. Mutually exclusive with
    ``external_noise``; requires packed-eligible dims.
    """
    raw = external_raw_noise is not None
    if raw:
        if external_noise is not None:
            raise ValueError("external_raw_noise excludes external_noise")
        if not packed_noise_ok(data_dim, latent_dim, intrinsic_dim):
            raise ValueError("external_raw_noise needs packed-eligible dims")
        a_blk, b_blk = external_raw_noise
        # third buffer unused in raw mode; keeps the (xn, z1n, z2n) plumbing
        external_noise = (a_blk, b_blk, jnp.zeros_like(a_blk))
        packed_noise = True
    elif packed_noise is None:
        # grid rows can carry DIFFERENT dims (scalar-prefetched) while the
        # static args describe only row 0 — so in grid mode the auto gate
        # is conservative (off) and grid callers opt in with bounds that
        # cover every row (train/grid.py uniform dims; mixed_grid maxes)
        packed_noise = (grid_n == 0 and
                        packed_noise_ok(data_dim, latent_dim, intrinsic_dim))
    packed_noise = packed_noise and (raw or external_noise is None)
    # Adam live-row bounds (8-aligned): We's rows span data_dim, Wd/Ws's
    # span latent_dim. Same grid-mode conservatism: a bound below any
    # row's dims would silently freeze that row's tail weights.
    if adam_rows is None:
        adam_rows = (data_dim, latent_dim) if grid_n == 0 else (N, N)
    we_rows = min(N, ((adam_rows[0] + 7) // 8) * 8)
    wd_rows = min(N, ((adam_rows[1] + 7) // 8) * 8)
    kernel = _make_kernel(
        n_steps=n_steps, batch=batch, data_dim=data_dim,
        latent_dim=latent_dim, intrinsic_dim=intrinsic_dim,
        var_added=var_added, eps_const=eps_const, tdv=tdv, lr=lr,
        external_noise=external_noise is not None,
        dataset_kind=dataset_kind, dual=dual, grid=grid_n > 0,
        fp32_dots=fp32_dots, packed_noise=packed_noise, raw_noise=raw,
        we_rows=we_rows, wd_rows=wd_rows,
    )
    lead = (grid_n,) if grid_n else ()
    blead = (1,) if grid_n else ()
    # order: we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec —
    # shapes/dtypes derived from the actual buffers so bf16 Adam moments
    # (--adam_dtype bf16) round-trip with their own dtype
    state_shapes = [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in buffers]
    # grid mode: per-seed loss blocks must be 8-row aligned for Mosaic
    n_steps_pad = ((n_steps + 7) // 8) * 8 if grid_n else n_steps
    loss_shape = ((grid_n * n_steps_pad, 1) if grid_n else (n_steps, 1))
    out_shapes = tuple(state_shapes) + (
        jax.ShapeDtypeStruct(loss_shape, jnp.float32),
    )
    inputs = [a_t, *buffers]
    if external_noise is not None:
        inputs += list(external_noise)
    n_in = len(inputs)
    # input_output_aliases indices span ALL flattened inputs including the
    # scalar-prefetch operand (index 0 = seed_and_t0, 1 = a_t). The twelve
    # state buffers (flattened indices 2..13) alias outputs 0..11 so the
    # training state round-trips in place.
    aliases = {j + 1: j - 1 for j in range(1, N_STATE_BUFFERS + 1)}

    if grid_n:
        def spec_for(shape):
            block = blead + shape
            # index_map receives (grid_idx, *scalar_prefetch_refs)
            return pl.BlockSpec(
                block, lambda i, *_: (i,) + (0,) * len(shape),
                memory_space=pltpu.VMEM)

        in_specs = [spec_for((N, N))]  # a_t
        for s in state_shapes:
            in_specs.append(spec_for(s.shape[1:]))
        if external_noise is not None:
            # test hook: per-seed noise streams, (1, n_steps, rows, N) blocks
            for noise in external_noise:
                in_specs.append(spec_for(noise.shape[1:]))
        # loss: flattened (grid_n*n_steps_pad, 1); seed i owns block row i
        loss_spec = pl.BlockSpec(
            (n_steps_pad, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        out_specs = tuple(
            [spec_for(s.shape[1:]) for s in state_shapes] + [loss_spec]
        )
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
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
            out_specs=tuple(
                [pl.BlockSpec(memory_space=pltpu.VMEM)] * (N_STATE_BUFFERS + 1)
            ),
        )
    n_matmuls = 10 if dual else 6
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_matmuls * 2 * N * N * N * n_steps,
            bytes_accessed=(9 * N * N + 3 * 8 * N + n_steps) * 4,
            transcendentals=(6 if packed_noise else 12) * N * N * n_steps,
        ),
    )(seed_and_t0, *inputs)
    losses = out[N_STATE_BUFFERS][:, 0]
    if grid_n:
        losses = losses.reshape(grid_n, n_steps_pad)[:, :n_steps]
    return out[:N_STATE_BUFFERS], losses


# ---------------------------------------------------------------------------
# TrainState <-> padded-buffer packing
# ---------------------------------------------------------------------------


def _adam_state(opt_state) -> optax.ScaleByAdamState:
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)
    ):
        if isinstance(s, optax.ScaleByAdamState):
            return s
    raise ValueError("no ScaleByAdamState in opt_state")


def _pack_mat(dst_shape, mat):
    # dtype-preserving: bf16 Adam-moment leaves (--adam_dtype bf16) pack
    # into bf16 buffers, f32 params into f32
    out = jnp.zeros(dst_shape, mat.dtype)
    return out.at[: mat.shape[0], : mat.shape[1]].set(mat)


def _pack_vec_buffer(be, bd, ep, eps_s, bs=None):
    vec = jnp.zeros((8, N), jnp.float32)
    vec = vec.at[ROW_BE, : be.shape[0]].set(be)
    vec = vec.at[ROW_BD, : bd.shape[0]].set(bd)
    vec = vec.at[ROW_EP, : ep.shape[0]].set(ep)
    if eps_s is not None:
        vec = vec.at[ROW_EPS, 0].set(eps_s[0])
    if bs is not None:
        vec = vec.at[ROW_BS, : bs.shape[0]].set(bs)
    return vec


def pack_state(state: TrainState, data_dim: int, latent_dim: int, tdv: bool,
               dual: bool = False):
    """→ 12-tuple (we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec)."""
    p = state.params
    adam = _adam_state(state.opt_state)

    def mats(tree):
        dual_tree = tree.get("SigDecoder") if dual else None
        wdt = tree["Encoder"]["FC0"]["kernel"].dtype  # bf16 for bf16 moments
        return (
            _pack_mat((N, N), tree["Encoder"]["FC0"]["kernel"]),
            _pack_mat((N, N), tree["Decoder"]["FC0"]["kernel"]),
            (_pack_mat((N, N), dual_tree["FC0"]["kernel"]) if dual
             else jnp.zeros((N, N), wdt)),
            _pack_vec_buffer(
                tree["Encoder"]["FC0"]["bias"],
                tree["Decoder"]["FC0"]["bias"],
                tree["epsilon_p"],
                tree.get("epsilon") if tdv else None,
                dual_tree["FC0"]["bias"] if dual else None,
            ),
        )

    we, wd, ws, vec = mats(p)
    mwe, mwd, mws, mvec = mats(adam.mu)
    vwe, vwd, vws, vvec = mats(adam.nu)
    return we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec


def unpack_state(
    state: TrainState,
    buffers,
    n_steps: int,
    data_dim: int,
    latent_dim: int,
    tdv: bool,
    dual: bool = False,
) -> TrainState:
    (we, wd, ws, vec, mwe, vwe, mwd, vwd, mws, vws, mvec, vvec) = buffers
    adam = _adam_state(state.opt_state)

    def unmats(we_, wd_, ws_, vec_, template):
        out = dict(template)
        out["Encoder"] = {
            "FC0": {
                "kernel": we_[:data_dim, :latent_dim],
                "bias": vec_[ROW_BE, :latent_dim],
            }
        }
        out["Decoder"] = {
            "FC0": {
                "kernel": wd_[:latent_dim, :data_dim],
                "bias": vec_[ROW_BD, :data_dim],
            }
        }
        if dual:
            out["SigDecoder"] = {
                "FC0": {
                    "kernel": ws_[:latent_dim, :data_dim],
                    "bias": vec_[ROW_BS, :data_dim],
                }
            }
        out["epsilon_p"] = vec_[ROW_EP, :latent_dim]
        if tdv:
            out["epsilon"] = vec_[ROW_EPS, 0:1]
        return out

    params = unmats(we, wd, ws, vec, state.params)
    mu = unmats(mwe, mwd, mws, mvec, adam.mu)
    nu = unmats(vwe, vwd, vws, vvec, adam.nu)
    new_count = adam.count + n_steps

    def rebuild(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=new_count, mu=mu, nu=nu)
        return s

    opt_state = jax.tree_util.tree_map(
        rebuild, state.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    )
    return state.replace(
        params=params, opt_state=opt_state, step=state.step + n_steps
    )


# ---------------------------------------------------------------------------
# StepFns integration
# ---------------------------------------------------------------------------


def pallas_supported(model, dataset, cfg, grid_over_mesh: bool = False,
                     interpret: bool = False) -> Tuple[bool, str]:
    """``grid_over_mesh=True`` = the caller shards a SEED GRID over the mesh
    (one kernel launch per device, seeds independent) — the supported
    multi-chip shape. Solo training under --mesh still uses the XLA path
    (a single tiny-batch step has nothing to shard a fused kernel over).
    ``interpret=True`` skips the backend check: interpret-mode pallas runs
    anywhere (the dp>1 CPU-mesh equivalence tests and dryrun_multichip)."""
    from ..data.synthetic import LinearGaussianDataset, SigmoidDataset

    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        return False, f"backend {jax.default_backend()!r} is not a TPU"
    if isinstance(dataset, LinearGaussianDataset):
        if model.dual_sigmoid_decoder:
            return False, "dual decoder needs the sigmoid dataset"
        intrinsic = dataset.intrinsic_dim
    elif isinstance(dataset, SigmoidDataset):
        if not model.dual_sigmoid_decoder:
            return False, "sigmoid dataset expects the dual decoder"
        intrinsic = dataset.dim
    else:
        return False, ("fused kernel supports the linear_gaussian and "
                       "sigmoid datasets")
    if model.encoder_features != (model.latent_dim,) or model.decoder_features != (
        dataset.dimension,
    ):
        return False, "fused kernel supports 0-hidden-layer (pure linear) nets"
    if cfg.batch_size > N:
        return False, f"batch_size must be <= {N}"
    if dataset.dimension > N or model.latent_dim > N or intrinsic > N:
        return False, f"dims must be <= {N}"
    if cfg.mesh and not grid_over_mesh:
        return False, ("mesh training uses the XLA path (to use the fused "
                       "kernels multi-chip, shard a seed grid: "
                       "--seed_grid ... --mesh dp=N)")
    return True, "ok"


@lru_cache(maxsize=64)
def _shared_chunk_fn(batch, data_dim, latent_dim, intrinsic_dim, var_added,
                     eps_const, tdv, lr, dataset_kind, dual,
                     fp32_dots=False):
    """One jitted chunk fn per STATIC config, shared across dataset seeds.

    The manifold matrix ``a_t`` is a runtime argument, so a whole multi-seed
    sweep (same shapes, different manifolds) reuses a single compiled
    kernel — 21 sweep runs pay one compile."""

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("state",))
    def train_chunk(a_t, state: TrainState, n_steps: int):
        seed_and_t0 = chunk_seed_and_t0(state)
        buffers = pack_state(state, data_dim, latent_dim, tdv, dual=dual)
        new_buffers, losses = run_fused_chunk(
            n_steps=n_steps,
            seed_and_t0=seed_and_t0,
            a_t=a_t,
            buffers=buffers,
            batch=batch,
            data_dim=data_dim,
            latent_dim=latent_dim,
            intrinsic_dim=intrinsic_dim,
            var_added=var_added,
            eps_const=eps_const,
            tdv=tdv,
            lr=lr,
            dataset_kind=dataset_kind,
            dual=dual,
            fp32_dots=fp32_dots,
        )
        new_state = unpack_state(
            state, new_buffers, n_steps, data_dim, latent_dim, tdv, dual=dual
        )
        return new_state, losses

    return train_chunk


def make_pallas_step_fns(model, dataset, tx, cfg) -> StepFns:
    data_dim = dataset.dimension
    latent_dim = model.latent_dim
    tdv = model.tunable_decoder_var
    dual = model.dual_sigmoid_decoder
    dataset_kind, var_added, intrinsic_dim, a_t_rows = manifold_rows([dataset])
    a_t = a_t_rows[0]

    base = make_step_fns(model, dataset, tx, cfg.batch_size)
    shared = _shared_chunk_fn(
        cfg.batch_size, data_dim, latent_dim, intrinsic_dim, float(var_added),
        float(model.epsilon), tdv, float(cfg.learning_rate), dataset_kind,
        dual, getattr(cfg, "precision", "bf16") == "fp32",
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
