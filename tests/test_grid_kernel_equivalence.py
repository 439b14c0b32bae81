"""Grid-mode fused kernels pinned to the solo kernels (and transitively to
the XLA/optax path): the multi-seed launch must be a pure batching of the
solo math.

Interpret mode on CPU with EXTERNAL noise (the same hook the solo
equivalence suites use). Covers:
  - grid_n=1 reproduces the solo kernel BITWISE for identical inputs;
  - each row of a grid_n=3 launch matches an identically-seeded solo run
    bitwise (rows are independent);
for both the linear/sigmoid kernel and the MLP kernel. Since the solo
kernels are pinned to jax.grad+optax (tests/test_pallas_kernel.py,
tests/test_mlp_kernel.py), this transitively pins the headline grid path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import test_mlp_kernel as mlp_t
import test_pallas_kernel as lin_t
from vae_training_tpu.kernels.linear_vae import (
    N,
    pack_state,
    run_fused_chunk,
    unpack_state,
)
from vae_training_tpu.kernels.mlp_vae import (
    LANE,
    _layer_dims,
    pack_mlp_state,
    run_mlp_fused_chunk,
    unpack_mlp_state,
)

N_STEPS = 4


def stack(xs):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)


def assert_trees_equal(a, b, msg=""):
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(b)}
    for path, val in jax.tree_util.tree_leaves_with_path(a):
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(val), np.asarray(flat_b[key]), err_msg=f"{msg}{key}")


# ---------------------------------------------------------------------------
# linear / sigmoid kernel
# ---------------------------------------------------------------------------


def _linear_solo(dataset, state, noise_padded, tdv, dual):
    buffers = pack_state(state, dataset.dimension, lin_t.LATENT, tdv, dual=dual)
    new_buffers, losses = run_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=jnp.array([123, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32), buffers=buffers,
        batch=lin_t.BATCH, data_dim=dataset.dimension,
        latent_dim=lin_t.LATENT, intrinsic_dim=lin_t.INTRINSIC,
        var_added=0.0, eps_const=-1.0, tdv=tdv, lr=1e-3, dual=dual,
        external_noise=noise_padded, interpret=True,
    )
    kstate = unpack_state(state, new_buffers, N_STEPS, dataset.dimension,
                          lin_t.LATENT, tdv, dual=dual)
    return new_buffers, np.asarray(losses), kstate


def _linear_grid(dataset_dims, states, noises, tdv, dual, grid_n):
    """All rows share the same static dims (one model config, many seeds)."""
    data_dim = dataset_dims
    buffers = stack([
        pack_state(st, data_dim, lin_t.LATENT, tdv, dual=dual) for st in states
    ])
    # grid rows: [seed, t0, data_dim, latent_dim, intrinsic_dim]
    seeds = jnp.tile(
        jnp.array([[123, 0, data_dim, lin_t.LATENT, lin_t.INTRINSIC]],
                  jnp.int32), (grid_n, 1))
    a_t = jnp.zeros((grid_n, N, N), jnp.float32)
    noise_g = tuple(jnp.stack([n[j] for n in noises])
                    for j in range(3))  # (grid_n, n_steps, rows, N) each
    new_buffers, losses = run_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds, a_t=a_t, buffers=buffers,
        batch=lin_t.BATCH, data_dim=data_dim, latent_dim=lin_t.LATENT,
        intrinsic_dim=lin_t.INTRINSIC, var_added=0.0, eps_const=-1.0,
        tdv=tdv, lr=1e-3, dual=dual, external_noise=noise_g,
        interpret=True, grid_n=grid_n,
    )
    return new_buffers, np.asarray(losses)


@pytest.mark.parametrize("kind,tdv", [
    ("linear", True), ("linear", False), ("sigmoid", True),
])
def test_linear_grid1_bitwise_equals_solo(kind, tdv):
    dual = kind == "sigmoid"
    dataset, model, tx, state = lin_t.setup(kind=kind, tdv=tdv)
    xs, z1s, z2s = lin_t.sample_noise(dataset, N_STEPS)
    noise = lin_t.pad_noise(xs, z1s, z2s, N_STEPS)

    solo_buffers, solo_losses, _ = _linear_solo(dataset, state, noise, tdv, dual)
    grid_buffers, grid_losses = _linear_grid(
        dataset.dimension, [state], [noise], tdv, dual, grid_n=1)

    np.testing.assert_array_equal(grid_losses[0], solo_losses)
    for j, (gb, sb) in enumerate(zip(grid_buffers, solo_buffers)):
        np.testing.assert_array_equal(np.asarray(gb[0]), np.asarray(sb),
                                      err_msg=f"buffer {j}")


@pytest.mark.parametrize("kind", ["linear", "sigmoid"])
def test_linear_grid3_rows_match_independent_solo_runs(kind):
    """Row i of a 3-seed grid launch == a solo run fed row i's inputs."""
    tdv, dual = True, kind == "sigmoid"
    states, noises, datasets = [], [], []
    for row_seed in range(3):
        dataset, model, tx, state = lin_t.setup(kind=kind, tdv=tdv)
        # distinct per-row params: perturb init deterministically
        state = state.replace(params=jax.tree_util.tree_map(
            lambda p: p + 0.01 * (row_seed + 1), state.params))
        xs, z1s, z2s = lin_t.sample_noise(dataset, N_STEPS, seed=10 + row_seed)
        datasets.append(dataset)
        states.append(state)
        noises.append(lin_t.pad_noise(xs, z1s, z2s, N_STEPS))

    grid_buffers, grid_losses = _linear_grid(
        datasets[0].dimension, states, noises, tdv, dual, grid_n=3)
    for i in range(3):
        solo_buffers, solo_losses, _ = _linear_solo(
            datasets[i], states[i], noises[i], tdv, dual)
        np.testing.assert_array_equal(grid_losses[i], solo_losses,
                                      err_msg=f"row {i} losses")
        for j, sb in enumerate(solo_buffers):
            np.testing.assert_array_equal(
                np.asarray(grid_buffers[j][i]), np.asarray(sb),
                err_msg=f"row {i} buffer {j}")


def test_linear_grid_mixed_dims_rows_match_solo():
    """Rows with DIFFERENT (data_dim, latent_dim) in ONE grid launch: the
    scalar-prefetched per-row dims must reproduce each solo run bitwise.
    This is the one-launch mixed-dimension sweep's math pinned down."""
    from vae_training_tpu.data import LinearGaussianDataset
    from vae_training_tpu.models import build_vae
    from vae_training_tpu.train import TrainState
    import optax

    rows = []  # (dataset, state, noise, dims)
    for dd, pad, ld in ((3, 9, 20), (4, 2, 10)):
        dataset = LinearGaussianDataset.create(
            2, dimension=dd, intrinsic_dimension=dd, padding_dimension=pad)
        model = build_vae(
            data_dim=dataset.dimension, latent_dim=ld,
            encoder_layer_sizes="", decoder_layer_sizes="",
            epsilon=-1.0, tunable_decoder_var=True)
        params = model.init(
            jax.random.PRNGKey(dd),
            jnp.zeros((1, dataset.dimension)), jnp.zeros((1, ld)),
            jnp.zeros((1, dataset.dimension)))["params"]
        state = TrainState.create(
            params=params, tx=optax.adam(1e-3),
            model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2))
        rng = np.random.RandomState(dd)
        D = dataset.dimension
        lat = rng.randn(N_STEPS, lin_t.BATCH, dd).astype(np.float32)
        xs = np.zeros((N_STEPS, lin_t.BATCH, D), np.float32)
        xs[:, :, :dd] = lat @ np.asarray(dataset.A.T)
        z1s = rng.randn(N_STEPS, lin_t.BATCH, ld).astype(np.float32)
        z2s = rng.randn(N_STEPS, lin_t.BATCH, D).astype(np.float32)
        noise = lin_t.pad_noise(xs, z1s, z2s, N_STEPS)
        rows.append((dataset, state, noise, (D, ld, dd)))

    # one mixed launch over both rows
    buffers = stack([
        pack_state(st, dims[0], dims[1], True) for _, st, _, dims in rows
    ])
    seeds = jnp.asarray(
        [[123, 0, *dims] for *_ , dims in rows], jnp.int32)
    noise_g = tuple(jnp.stack([r[2][j] for r in rows]) for j in range(3))
    new_buffers, losses = run_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds,
        a_t=jnp.zeros((2, N, N), jnp.float32), buffers=buffers,
        batch=lin_t.BATCH, data_dim=rows[0][3][0], latent_dim=rows[0][3][1],
        intrinsic_dim=rows[0][3][2], var_added=0.0, eps_const=-1.0,
        tdv=True, lr=1e-3, dual=False, external_noise=noise_g,
        interpret=True, grid_n=2,
    )
    losses = np.asarray(losses)

    # each row == its own solo launch with that row's static dims
    for i, (dataset, state, noise, dims) in enumerate(rows):
        solo_buffers, solo_losses = run_fused_chunk(
            n_steps=N_STEPS, seed_and_t0=jnp.array([123, 0], jnp.int32),
            a_t=jnp.zeros((N, N), jnp.float32),
            buffers=pack_state(state, dims[0], dims[1], True),
            batch=lin_t.BATCH, data_dim=dims[0], latent_dim=dims[1],
            intrinsic_dim=dims[2], var_added=0.0, eps_const=-1.0,
            tdv=True, lr=1e-3, dual=False, external_noise=noise,
            interpret=True,
        )
        np.testing.assert_array_equal(losses[i], np.asarray(solo_losses),
                                      err_msg=f"row {i} losses")
        for j, sb in enumerate(solo_buffers):
            np.testing.assert_array_equal(
                np.asarray(new_buffers[j][i]), np.asarray(sb),
                err_msg=f"row {i} buffer {j}")


# ---------------------------------------------------------------------------
# MLP kernel
# ---------------------------------------------------------------------------


def _mlp_solo(dataset, model, state, noise_padded, tdv):
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, mlp_t.LATENT)
    packed = pack_mlp_state(state, enc_dims, dec_dims, tdv)
    new_packed, losses = run_mlp_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32), packed=packed,
        batch=mlp_t.BATCH, data_dim=D, latent_dim=mlp_t.LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims, dataset_kind="sphere",
        intrinsic_dim=dataset.dim, var_added=0.0, eps_const=-3.0,
        tdv=tdv, lr=1e-3, external_noise=noise_padded, interpret=True,
    )
    return new_packed, np.asarray(losses)


def _flatten_packed(packed):
    (pw, pb, pvec, mw, mb, mvec, vw, vb, vvec) = packed
    return [*pw, *pb, pvec, *mw, *mb, mvec, *vw, *vb, vvec]


def test_mlp_grid_rows_match_independent_solo_runs():
    tdv = True
    dataset, model, tx, base_state = mlp_t.setup(tdv=tdv)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, mlp_t.LATENT)

    states, noises = [], []
    for row_seed in range(3):
        state = base_state.replace(params=jax.tree_util.tree_map(
            lambda p: p + 0.01 * (row_seed + 1), base_state.params))
        xs, z1s, z2s = mlp_t.sphere_noise(dataset, N_STEPS, seed=20 + row_seed)
        states.append(state)
        noises.append(mlp_t.pad_noise(xs, z1s, z2s, N_STEPS))

    packed_g = stack([
        pack_mlp_state(st, enc_dims, dec_dims, tdv) for st in states
    ])
    seeds = jnp.tile(jnp.array([[7, 0, D, mlp_t.LATENT, dataset.dim]],
                               jnp.int32), (3, 1))
    noise_g = tuple(jnp.stack([n[j] for n in noises]) for j in range(3))
    new_packed_g, losses_g = run_mlp_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds,
        a_t=jnp.zeros((3, LANE, LANE), jnp.float32), packed=packed_g,
        batch=mlp_t.BATCH, data_dim=D, latent_dim=mlp_t.LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims, dataset_kind="sphere",
        intrinsic_dim=dataset.dim, var_added=0.0, eps_const=-3.0,
        tdv=tdv, lr=1e-3, external_noise=noise_g, interpret=True, grid_n=3,
    )
    losses_g = np.asarray(losses_g)
    for i in range(3):
        solo_packed, solo_losses = _mlp_solo(
            dataset, model, states[i], noises[i], tdv)
        np.testing.assert_array_equal(losses_g[i], solo_losses,
                                      err_msg=f"row {i} losses")
        flat_g = _flatten_packed(new_packed_g)
        flat_s = _flatten_packed(solo_packed)
        for j, (gb, sb) in enumerate(zip(flat_g, flat_s)):
            np.testing.assert_array_equal(
                np.asarray(gb[i]), np.asarray(sb),
                err_msg=f"row {i} buffer {j}")


def test_mlp_grid_mixed_dims_rows_match_solo():
    """MLP-kernel rows with DIFFERENT (data_dim, latent_dim) in ONE grid
    launch (the one-launch sphere sweep): scalar-prefetched dims must
    reproduce each solo run bitwise. Hidden widths are uniform so the
    padded buffer layout matches across rows."""
    from vae_training_tpu.data import SphereDataset
    from vae_training_tpu.models import build_vae
    from vae_training_tpu.train import TrainState
    import optax

    tdv = True
    rows = []  # (state, noise, enc_dims, dec_dims, dims)
    for dd, pad, ld in ((3, 3, 6), (5, 8, 10)):
        dataset = SphereDataset(dim=dd, padding_dim=pad)
        model = build_vae(
            data_dim=dataset.dimension, latent_dim=ld,
            encoder_layer_sizes="24|24", decoder_layer_sizes="24|24",
            epsilon=-3.0, tunable_decoder_var=tdv)
        params = model.init(
            jax.random.PRNGKey(dd),
            jnp.zeros((1, dataset.dimension)), jnp.zeros((1, ld)),
            jnp.zeros((1, dataset.dimension)))["params"]
        state = TrainState.create(
            params=params, tx=optax.adam(1e-3),
            model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2))
        enc_dims = _layer_dims(model.encoder_features, dataset.dimension)
        dec_dims = _layer_dims(model.decoder_features, ld)
        rng = np.random.RandomState(dd)
        D = dataset.dimension
        g = rng.randn(N_STEPS, mlp_t.BATCH, dd).astype(np.float32)
        on = g / np.linalg.norm(g, axis=-1, keepdims=True)
        xs = np.zeros((N_STEPS, mlp_t.BATCH, D), np.float32)
        xs[:, :, :dd] = on
        z1s = rng.randn(N_STEPS, mlp_t.BATCH, ld).astype(np.float32)
        z2s = rng.randn(N_STEPS, mlp_t.BATCH, D).astype(np.float32)
        noise = mlp_t.pad_noise(xs, z1s, z2s, N_STEPS)
        rows.append((state, noise, enc_dims, dec_dims, (D, ld, dd)))

    packed_g = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0),
        *[jax.tree_util.tree_map(
            lambda x: x[None],
            pack_mlp_state(st, e, d, tdv))
          for st, _, e, d, _ in rows])
    seeds = jnp.asarray([[7, 0, *dims] for *_, dims in rows], jnp.int32)
    noise_g = tuple(jnp.stack([r[1][j] for r in rows]) for j in range(3))
    enc0, dec0 = rows[0][2], rows[0][3]
    new_packed_g, losses_g = run_mlp_fused_chunk(
        n_steps=N_STEPS, seed_and_t0=seeds,
        a_t=jnp.zeros((2, LANE, LANE), jnp.float32), packed=packed_g,
        batch=mlp_t.BATCH, data_dim=rows[0][4][0], latent_dim=rows[0][4][1],
        enc_dims=enc0, dec_dims=dec0, dataset_kind="sphere",
        intrinsic_dim=rows[0][4][2], var_added=0.0, eps_const=-3.0,
        tdv=tdv, lr=1e-3, external_noise=noise_g, interpret=True, grid_n=2,
    )
    losses_g = np.asarray(losses_g)
    flat_g = _flatten_packed(new_packed_g)
    for i, (state, noise, enc_dims, dec_dims, dims) in enumerate(rows):
        packed = pack_mlp_state(state, enc_dims, dec_dims, tdv)
        solo_packed, solo_losses = run_mlp_fused_chunk(
            n_steps=N_STEPS, seed_and_t0=jnp.array([7, 0], jnp.int32),
            a_t=jnp.zeros((LANE, LANE), jnp.float32), packed=packed,
            batch=mlp_t.BATCH, data_dim=dims[0], latent_dim=dims[1],
            enc_dims=enc_dims, dec_dims=dec_dims, dataset_kind="sphere",
            intrinsic_dim=dims[2], var_added=0.0, eps_const=-3.0,
            tdv=tdv, lr=1e-3, external_noise=noise, interpret=True,
        )
        np.testing.assert_array_equal(losses_g[i], np.asarray(solo_losses),
                                      err_msg=f"row {i} losses")
        for j, sb in enumerate(_flatten_packed(solo_packed)):
            np.testing.assert_array_equal(
                np.asarray(flat_g[j][i]), np.asarray(sb),
                err_msg=f"row {i} buffer {j}")


def test_mlp_grid1_unpack_matches_solo_state():
    """grid_n=1 end-to-end through pack → kernel → unpack equals solo."""
    tdv = False
    dataset, model, tx, state = mlp_t.setup(tdv=tdv)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, mlp_t.LATENT)
    xs, z1s, z2s = mlp_t.sphere_noise(dataset, N_STEPS, seed=5)
    noise = mlp_t.pad_noise(xs, z1s, z2s, N_STEPS)

    solo_packed, solo_losses = _mlp_solo(dataset, model, state, noise, tdv)
    solo_state = unpack_mlp_state(state, solo_packed, N_STEPS, enc_dims,
                                  dec_dims, tdv, mlp_t.LATENT)

    packed_g = stack([pack_mlp_state(state, enc_dims, dec_dims, tdv)])
    noise_g = tuple(n[None] for n in noise)
    new_packed_g, losses_g = run_mlp_fused_chunk(
        n_steps=N_STEPS,
        seed_and_t0=jnp.array([[7, 0, D, mlp_t.LATENT, dataset.dim]],
                              jnp.int32),
        a_t=jnp.zeros((1, LANE, LANE), jnp.float32), packed=packed_g,
        batch=mlp_t.BATCH, data_dim=D, latent_dim=mlp_t.LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims, dataset_kind="sphere",
        intrinsic_dim=dataset.dim, var_added=0.0, eps_const=-3.0,
        tdv=tdv, lr=1e-3, external_noise=noise_g, interpret=True, grid_n=1,
    )
    np.testing.assert_array_equal(np.asarray(losses_g)[0], solo_losses)
    row0 = jax.tree_util.tree_map(lambda x: x[0], new_packed_g)
    grid_state = unpack_mlp_state(state, row0, N_STEPS, enc_dims, dec_dims,
                                  tdv, mlp_t.LATENT)
    assert_trees_equal(grid_state.params, solo_state.params)
    assert_trees_equal(grid_state.opt_state, solo_state.opt_state)
