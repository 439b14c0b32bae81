"""Seeded fuzz of the GRID kernels' mixed-dimension row machinery —
VERDICT r4 item 7.

tests/test_grid_kernel_equivalence.py pins the grid path at fixed shapes;
this file SAMPLES random row sets: each seeded draw builds ONE grid launch
of 1-21 rows with randomly mixed (data_dim, latent_dim, intrinsic_dim) per
row — the scalar-prefetched per-row masks (kernels/linear_vae.py grid mode)
are exactly the arithmetic under test — and pins every row BITWISE to a
solo-kernel launch with that row's dims and inputs. External-noise hook as
in all equivalence suites; interpret mode (runs on CPU, same kernel body).

Every case derives from ``VAE_FUZZ_SEED`` (default pinned below); failure
messages carry the case dict + seed so any draw reproduces exactly.
Slow-marked like the solo fuzz.

Reference math being guarded across the sweep grids:
/root/reference/networks.py:87-101 at every (dd, pd, ld) the scripts sweep.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kernel_test_helpers import pad_noise
from vae_training_tpu.kernels.linear_vae import (
    N,
    pack_state,
    run_fused_chunk,
)
from vae_training_tpu.kernels.mlp_vae import (
    LANE,
    _layer_dims,
    pack_mlp_state,
    run_mlp_fused_chunk,
)
from vae_training_tpu.models import build_vae
from vae_training_tpu.train import TrainState

FUZZ_SEED = int(os.environ.get("VAE_FUZZ_SEED", "20260820"))
N_STEPS = 3
N_LINEAR_LAUNCHES = 6
N_MLP_LAUNCHES = 4


def stack(xs):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)


def _make_state(model, D, ld, key):
    params = model.init(
        key, jnp.zeros((1, D)), jnp.zeros((1, ld)), jnp.zeros((1, D))
    )["params"]
    return TrainState.create(
        params=params, tx=optax.adam(1e-3),
        model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2))


def _row_noise(rng, batch, D, ld, lane):
    xs = rng.randn(N_STEPS, batch, D).astype(np.float32)
    z1s = rng.randn(N_STEPS, batch, ld).astype(np.float32)
    z2s = rng.randn(N_STEPS, batch, D).astype(np.float32)
    return pad_noise(xs, z1s, z2s, N_STEPS, batch=batch, lane=lane)


@pytest.mark.slow
@pytest.mark.parametrize("launch", range(N_LINEAR_LAUNCHES))
def test_linear_grid_fuzz_rows_match_solo(launch):
    rng = np.random.RandomState(FUZZ_SEED + 101 * launch)
    case = dict(
        launch=launch,
        grid_n=int(rng.randint(1, 22)),
        tdv=bool(rng.randint(2)),
        dual=bool(rng.randint(2)),  # the sigmoid dual-decoder variant
        batch=int(rng.choice([1, 3, 16, 100])),
        fp32=bool(rng.randint(2)),
    )
    msg = f"seed={FUZZ_SEED} case={case} "
    dataset_name = "sigmoid" if case["dual"] else "linear_gaussian"
    rows = []  # (dims, state, noise)
    for r in range(case["grid_n"]):
        dd = int(rng.randint(1, 9))
        D = dd + int(rng.randint(0, 21))
        ld = int(rng.randint(1, 25))
        model = build_vae(
            data_dim=D, latent_dim=ld, encoder_layer_sizes="",
            decoder_layer_sizes="", epsilon=-1.0,
            tunable_decoder_var=case["tdv"], dataset_name=dataset_name)
        state = _make_state(model, D, ld, jax.random.PRNGKey(1000 + r))
        noise = _row_noise(rng, case["batch"], D, ld, N)
        rows.append(((D, ld, dd), state, noise))

    grid_n = case["grid_n"]
    buffers = stack([
        pack_state(st, dims[0], dims[1], case["tdv"], dual=case["dual"])
        for dims, st, _ in rows
    ])
    seeds = jnp.asarray([[123 + i, 0, *dims]
                         for i, (dims, _, _) in enumerate(rows)], jnp.int32)
    noise_g = tuple(jnp.stack([r[2][j] for r in rows]) for j in range(3))
    new_buffers, losses = run_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds,
        a_t=jnp.zeros((grid_n, N, N), jnp.float32), buffers=buffers,
        batch=case["batch"], data_dim=rows[0][0][0],
        latent_dim=rows[0][0][1], intrinsic_dim=rows[0][0][2],
        var_added=0.0, eps_const=-1.0, tdv=case["tdv"], lr=1e-3,
        dual=case["dual"], external_noise=noise_g, interpret=True,
        grid_n=grid_n, fp32_dots=case["fp32"],
    )
    losses = np.asarray(losses)

    for i, (dims, state, noise) in enumerate(rows):
        solo_buffers, solo_losses = run_fused_chunk(
            n_steps=N_STEPS, seed_and_t0=jnp.array([123 + i, 0], jnp.int32),
            a_t=jnp.zeros((N, N), jnp.float32),
            buffers=pack_state(state, dims[0], dims[1], case["tdv"],
                               dual=case["dual"]),
            batch=case["batch"], data_dim=dims[0], latent_dim=dims[1],
            intrinsic_dim=dims[2], var_added=0.0, eps_const=-1.0,
            tdv=case["tdv"], lr=1e-3, dual=case["dual"],
            external_noise=noise, interpret=True, fp32_dots=case["fp32"],
        )
        np.testing.assert_array_equal(
            losses[i], np.asarray(solo_losses),
            err_msg=msg + f"row {i} dims={dims} losses")
        for j, sb in enumerate(solo_buffers):
            np.testing.assert_array_equal(
                np.asarray(new_buffers[j][i]), np.asarray(sb),
                err_msg=msg + f"row {i} dims={dims} buffer {j}")


@pytest.mark.slow
@pytest.mark.parametrize("launch", range(N_MLP_LAUNCHES))
def test_mlp_grid_fuzz_rows_match_solo(launch):
    """MLP grid rows share hidden widths (uniform padded layout — the
    one-launch sweep's real constraint) but mix (dd, pad, ld) per row."""
    rng = np.random.RandomState(FUZZ_SEED + 977 * launch)
    depth = int(rng.randint(1, 3))
    widths = [int(rng.choice([8, 24, 33, 64, 96])) for _ in range(depth)]
    case = dict(
        launch=launch,
        grid_n=int(rng.randint(1, 9)),
        tdv=bool(rng.randint(2)),
        batch=int(rng.choice([3, 16, 64])),
        widths=widths,
    )
    msg = f"seed={FUZZ_SEED} case={case} "
    hidden = "|".join(str(w) for w in widths)
    rows = []  # (dims, state, noise, enc_dims, dec_dims)
    for r in range(case["grid_n"]):
        dd = int(rng.randint(1, 7))
        D = dd + int(rng.randint(0, 11))
        ld = int(rng.randint(1, 13))
        model = build_vae(
            data_dim=D, latent_dim=ld, encoder_layer_sizes=hidden,
            decoder_layer_sizes=hidden, epsilon=-3.0,
            tunable_decoder_var=case["tdv"])
        state = _make_state(model, D, ld, jax.random.PRNGKey(2000 + r))
        enc_dims = _layer_dims(model.encoder_features, D)
        dec_dims = _layer_dims(model.decoder_features, ld)
        noise = _row_noise(rng, case["batch"], D, ld, LANE)
        rows.append(((D, ld, dd), state, noise, enc_dims, dec_dims))

    grid_n = case["grid_n"]
    packed_g = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0),
        *[jax.tree_util.tree_map(
            lambda x: x[None], pack_mlp_state(st, e, d, case["tdv"]))
          for _, st, _, e, d in rows])
    seeds = jnp.asarray([[7 + i, 0, *dims]
                         for i, (dims, *_) in enumerate(rows)], jnp.int32)
    noise_g = tuple(jnp.stack([r[2][j] for r in rows]) for j in range(3))
    enc0, dec0 = rows[0][3], rows[0][4]
    new_packed_g, losses_g = run_mlp_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds,
        a_t=jnp.zeros((grid_n, LANE, LANE), jnp.float32), packed=packed_g,
        batch=case["batch"], data_dim=rows[0][0][0],
        latent_dim=rows[0][0][1], enc_dims=enc0, dec_dims=dec0,
        dataset_kind="sphere", intrinsic_dim=rows[0][0][2], var_added=0.0,
        eps_const=-3.0, tdv=case["tdv"], lr=1e-3, external_noise=noise_g,
        interpret=True, grid_n=grid_n,
    )
    losses_g = np.asarray(losses_g)

    def flatten_packed(packed):
        (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec) = packed
        return [*pw, *pb, pvec, *mw, *mb, mvec, *vw, *vb, vvec]

    flat_g = flatten_packed(new_packed_g)
    for i, (dims, state, noise, enc_dims, dec_dims) in enumerate(rows):
        solo_packed, solo_losses = run_mlp_fused_chunk(
            n_steps=N_STEPS, seed_and_t0=jnp.array([7 + i, 0], jnp.int32),
            a_t=jnp.zeros((LANE, LANE), jnp.float32),
            packed=pack_mlp_state(state, enc_dims, dec_dims, case["tdv"]),
            batch=case["batch"], data_dim=dims[0], latent_dim=dims[1],
            enc_dims=enc_dims, dec_dims=dec_dims, dataset_kind="sphere",
            intrinsic_dim=dims[2], var_added=0.0, eps_const=-3.0,
            tdv=case["tdv"], lr=1e-3, external_noise=noise, interpret=True,
        )
        np.testing.assert_array_equal(
            losses_g[i], np.asarray(solo_losses),
            err_msg=msg + f"row {i} dims={dims} losses")
        for j, sb in enumerate(flatten_packed(solo_packed)):
            np.testing.assert_array_equal(
                np.asarray(flat_g[j][i]), np.asarray(sb),
                err_msg=msg + f"row {i} dims={dims} buffer {j}")
