"""Fused MLP-VAE Pallas kernel: math equivalence against the XLA path
(external-noise hook, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_training_tpu.data import LinearGaussianDataset, SphereDataset
from vae_training_tpu.kernels.linear_vae import _adam_state
from vae_training_tpu.kernels.mlp_vae import (
    LANE,
    _layer_dims,
    mlp_pallas_supported,
    pack_mlp_state,
    run_mlp_fused_chunk,
    unpack_mlp_state,
)
from vae_training_tpu.models import build_vae
from vae_training_tpu.train import TrainState

BATCH = 32
LATENT = 6
HIDDEN = "24|24"


def setup(tdv=True, kind="sphere", adam_dtype="f32"):
    from vae_training_tpu.train.state import make_adam

    if kind == "sigmoid":
        from vae_training_tpu.data import SigmoidDataset

        dataset = SigmoidDataset.create(2, dimension=3, padding_dimension=4)
        dataset_name = "sigmoid"
    else:
        dataset = SphereDataset(dim=3, padding_dim=5)
        dataset_name = None
    model = build_vae(
        data_dim=dataset.dimension, latent_dim=LATENT,
        encoder_layer_sizes=HIDDEN, decoder_layer_sizes=HIDDEN,
        epsilon=-3.0, tunable_decoder_var=tdv, dataset_name=dataset_name,
    )
    tx = make_adam(1e-3, adam_dtype)  # == optax.adam(1e-3) for f32
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, dataset.dimension)), jnp.zeros((1, LATENT)),
        jnp.zeros((1, dataset.dimension)),
    )["params"]
    state = TrainState.create(
        params=params, tx=tx,
        model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2),
    )
    return dataset, model, tx, state


def sphere_noise(dataset, n_steps, seed=0):
    rng = np.random.RandomState(seed)
    D = dataset.dimension
    g = rng.randn(n_steps, BATCH, dataset.dim).astype(np.float32)
    on = g / np.linalg.norm(g, axis=-1, keepdims=True)
    xs = np.zeros((n_steps, BATCH, D), np.float32)
    xs[:, :, : dataset.dim] = on
    z1s = rng.randn(n_steps, BATCH, LATENT).astype(np.float32)
    z2s = rng.randn(n_steps, BATCH, D).astype(np.float32)
    return xs, z1s, z2s


from kernel_test_helpers import (  # noqa: E402 — shared equivalence helpers
    assert_adam_moments,
    assert_trees_close,
    run_xla_steps,
)
from kernel_test_helpers import pad_noise as _pad_noise  # noqa: E402


def pad_noise(x, z1, z2, n_steps):
    return _pad_noise(x, z1, z2, n_steps, batch=BATCH, lane=LANE)


@pytest.mark.parametrize("tdv,adam_dtype", [
    (True, "f32"), (False, "f32"),
    # bf16 weight-matrix moments: kernel and optax chain must round
    # identically (bitwise-pinned by assert_adam_moments)
    (True, "bf16"),
])
def test_mlp_kernel_matches_xla(tdv, adam_dtype):
    n_steps = 4
    dataset, model, tx, state = setup(tdv=tdv, adam_dtype=adam_dtype)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)
    xs, z1s, z2s = sphere_noise(dataset, n_steps)
    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)
    packed = pack_mlp_state(state, enc_dims, dec_dims, tdv)
    new_packed, losses = run_mlp_fused_chunk(
        n_steps=n_steps,
        seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32),
        packed=packed,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sphere", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=tdv, lr=1e-3,
        external_noise=(xp, z1p, z2p), interpret=True,
    )
    kstate = unpack_mlp_state(state, new_packed, n_steps, enc_dims, dec_dims,
                              tdv, LATENT)
    xparams, xopt, xlosses = run_xla_steps(
        model, tx, state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(np.asarray(losses), xlosses, rtol=3e-4,
                               atol=3e-4)
    assert_trees_close(kstate.params, xparams, rtol=1e-3, atol=1e-5)
    ka, xa = _adam_state(kstate.opt_state), _adam_state(xopt)
    assert int(ka.count) == int(xa.count) == n_steps
    # nu (second moments) pinned too — a wrong beta2/missing square must
    # not hide inside the param tolerance over 4 steps
    assert_adam_moments(ka, xa, mu_rtol=1e-3, mu_atol=1e-6,
                        nu_rtol=1e-3, nu_atol=1e-9)


@pytest.mark.parametrize("tdv,adam_dtype", [
    (True, "f32"), (False, "f32"), (True, "bf16"),
])
def test_mlp_dual_decoder_kernel_matches_xla(tdv, adam_dtype):
    """Sigmoid dataset + hidden-layer dual decoder (σ(SigMLP)+MLP):
    the kernel's second decoder stack and its backward vs jax.grad+optax."""
    n_steps = 4
    dataset, model, tx, state = setup(tdv=tdv, kind="sigmoid",
                                      adam_dtype=adam_dtype)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)
    rng = np.random.RandomState(11)
    z = rng.randn(n_steps, BATCH, dataset.dim).astype(np.float32)
    sig = 1 / (1 + np.exp(-(z @ np.asarray(dataset.A))))
    pad = np.zeros((n_steps, BATCH, D - dataset.dim - 1), np.float32)
    xs = np.concatenate([z, sig, pad], axis=-1)
    z1s = rng.randn(n_steps, BATCH, LATENT).astype(np.float32)
    z2s = rng.randn(n_steps, BATCH, D).astype(np.float32)
    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)

    packed = pack_mlp_state(state, enc_dims, dec_dims, tdv, dual=True)
    new_packed, losses = run_mlp_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32), packed=packed,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sigmoid", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=tdv, lr=1e-3,
        external_noise=(xp, z1p, z2p), interpret=True, dual=True,
    )
    kstate = unpack_mlp_state(state, new_packed, n_steps, enc_dims, dec_dims,
                              tdv, LATENT, dual=True)
    xparams, xopt, xlosses = run_xla_steps(
        model, tx, state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(np.asarray(losses), xlosses, rtol=3e-4,
                               atol=3e-4)
    assert_trees_close(kstate.params, xparams, rtol=1e-3, atol=1e-5)
    ka, xa = _adam_state(kstate.opt_state), _adam_state(xopt)
    assert int(ka.count) == int(xa.count) == n_steps
    assert_adam_moments(ka, xa, mu_rtol=1e-3, mu_atol=1e-6,
                        nu_rtol=1e-3, nu_atol=1e-9)


def test_mlp_dual_padded_regions_stay_zero():
    n_steps = 3
    dataset, model, tx, state = setup(tdv=True, kind="sigmoid")
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)
    rng = np.random.RandomState(4)
    z = rng.randn(n_steps, BATCH, dataset.dim).astype(np.float32)
    sig = 1 / (1 + np.exp(-(z @ np.asarray(dataset.A))))
    pad = np.zeros((n_steps, BATCH, D - dataset.dim - 1), np.float32)
    xs = np.concatenate([z, sig, pad], axis=-1)
    z1s = rng.randn(n_steps, BATCH, LATENT).astype(np.float32)
    z2s = rng.randn(n_steps, BATCH, D).astype(np.float32)
    packed = pack_mlp_state(state, enc_dims, dec_dims, True, dual=True)
    new_packed, _ = run_mlp_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32), packed=packed,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sigmoid", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=True, lr=1e-3,
        external_noise=pad_noise(xs, z1s, z2s, n_steps), interpret=True,
        dual=True,
    )
    from vae_training_tpu.kernels.mlp_vae import _all_layer_dims

    all_dims = _all_layer_dims(enc_dims, dec_dims, True)
    for li, (din, dout) in enumerate(all_dims):
        w = np.asarray(new_packed[0][li])
        assert np.all(w[din:, :] == 0) and np.all(w[:, dout:] == 0), li
        b = np.asarray(new_packed[1][li])
        assert np.all(b[0, dout:] == 0), li


def test_mlp_padded_regions_stay_zero():
    n_steps = 3
    dataset, model, tx, state = setup(tdv=True)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)
    xs, z1s, z2s = sphere_noise(dataset, n_steps, seed=3)
    packed = pack_mlp_state(state, enc_dims, dec_dims, True)
    new_packed, _ = run_mlp_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32), packed=packed,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sphere", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=True, lr=1e-3,
        external_noise=pad_noise(xs, z1s, z2s, n_steps), interpret=True,
    )
    all_dims = enc_dims + dec_dims
    for li, (din, dout) in enumerate(all_dims):
        w = np.asarray(new_packed[0][li])
        assert np.all(w[din:, :] == 0) and np.all(w[:, dout:] == 0), li
        b = np.asarray(new_packed[1][li])
        assert np.all(b[0, dout:] == 0), li


def test_mlp_kernel_fp32_dots_identical_on_cpu():
    """--precision fp32 (Precision.HIGHEST dots) must be a numeric no-op on
    the CPU interpret backend, where default dots are already exact fp32 —
    i.e. the flag changes the MXU pass structure on TPU, never the math.
    (On TPU, default f32 dots are single-pass bf16-operand; HIGHEST is the
    true-fp32 mode. Measured there by tools/check_precision.py.)"""
    n_steps = 4
    dataset, model, tx, state = setup(tdv=True)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)
    xs, z1s, z2s = sphere_noise(dataset, n_steps, seed=9)
    noise = pad_noise(xs, z1s, z2s, n_steps)
    kwargs = dict(
        n_steps=n_steps, seed_and_t0=jnp.array([7, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32),
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sphere", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=True, lr=1e-3,
        external_noise=noise, interpret=True,
    )
    packed = pack_mlp_state(state, enc_dims, dec_dims, True)
    pk_def, losses_def = run_mlp_fused_chunk(packed=packed, **kwargs)
    packed = pack_mlp_state(state, enc_dims, dec_dims, True)
    pk_hi, losses_hi = run_mlp_fused_chunk(packed=packed, fp32_dots=True,
                                           **kwargs)
    np.testing.assert_array_equal(np.asarray(losses_hi),
                                  np.asarray(losses_def))
    # EVERY buffer (weights, biases, vec, and all Adam moments) must be
    # bit-identical — the flag only changes MXU pass structure on TPU
    for a, b in zip(jax.tree_util.tree_leaves(pk_hi),
                    jax.tree_util.tree_leaves(pk_def), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


BATCH_SMALL = 6


def test_linear_kernel_fp32_dots_identical_on_cpu():
    from vae_training_tpu.data import LinearGaussianDataset
    from vae_training_tpu.kernels.linear_vae import (
        pack_state, run_fused_chunk, N)
    from vae_training_tpu.train import TrainState

    dataset = LinearGaussianDataset.create(2, dimension=3,
                                           intrinsic_dimension=2,
                                           padding_dimension=4)
    model = build_vae(data_dim=dataset.dimension, latent_dim=5, epsilon=-1.0,
                      tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, dataset.dimension)),
        jnp.zeros((1, 5)), jnp.zeros((1, dataset.dimension)))["params"]
    state = TrainState.create(params=params, tx=tx,
                              model_key=jax.random.PRNGKey(1),
                              data_key=jax.random.PRNGKey(2))
    rng = np.random.RandomState(3)
    n_steps, rows = 3, 8
    xs = np.zeros((n_steps, rows, N), np.float32)
    xs[:, :BATCH_SMALL, : dataset.dimension] = rng.randn(
        n_steps, BATCH_SMALL, dataset.dimension)
    z1 = np.zeros((n_steps, rows, N), np.float32)
    z1[:, :BATCH_SMALL, :5] = rng.randn(n_steps, BATCH_SMALL, 5)
    z2 = np.zeros((n_steps, rows, N), np.float32)
    z2[:, :BATCH_SMALL, : dataset.dimension] = rng.randn(
        n_steps, BATCH_SMALL, dataset.dimension)
    a_t = jnp.zeros((N, N), jnp.float32)
    kw = dict(n_steps=n_steps, seed_and_t0=jnp.array([5, 0], jnp.int32),
              a_t=a_t, batch=BATCH_SMALL, data_dim=dataset.dimension,
              latent_dim=5, intrinsic_dim=2, var_added=0.0, eps_const=-1.0,
              tdv=True, lr=1e-3,
              external_noise=tuple(map(jnp.asarray, (xs, z1, z2))),
              interpret=True)
    b_def, l_def = run_fused_chunk(
        buffers=pack_state(state, dataset.dimension, 5, True), **kw)
    b_hi, l_hi = run_fused_chunk(
        buffers=pack_state(state, dataset.dimension, 5, True),
        fp32_dots=True, **kw)
    np.testing.assert_array_equal(np.asarray(l_hi), np.asarray(l_def))
    for a, b in zip(jax.tree_util.tree_leaves(b_hi),
                    jax.tree_util.tree_leaves(b_def), strict=True):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_precision_flag_validation():
    from vae_training_tpu.config import RunConfig

    RunConfig(dataset="sphere", precision="fp32").validate()
    with pytest.raises(ValueError, match="precision"):
        RunConfig(dataset="sphere", precision="fp16").validate()


def test_linen_model_precision_identical_on_cpu():
    """--precision also reaches the XLA/linen path (nn.Dense precision=...);
    on CPU both modes are exact fp32 so outputs must be identical — the
    flag only changes MXU pass structure on TPU."""
    dataset = SphereDataset(dim=3, padding_dim=5)
    outs = {}
    for spec in ("bf16", "fp32"):
        model = build_vae(
            data_dim=dataset.dimension, latent_dim=LATENT,
            encoder_layer_sizes=HIDDEN, decoder_layer_sizes=HIDDEN,
            epsilon=-3.0, tunable_decoder_var=True, precision=spec,
        )
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, dataset.dimension)), jnp.zeros((1, LATENT)),
            jnp.zeros((1, dataset.dimension)))["params"]
        x = dataset.sample(jax.random.PRNGKey(1), BATCH)
        z1 = jax.random.normal(jax.random.PRNGKey(2), (BATCH, LATENT))
        z2 = jax.random.normal(jax.random.PRNGKey(3),
                               (BATCH, dataset.dimension))
        x_hat, mu, _, _ = model.apply({"params": params}, x, z1, z2)
        outs[spec] = (np.asarray(x_hat), np.asarray(mu))
    np.testing.assert_array_equal(outs["bf16"][0], outs["fp32"][0])
    np.testing.assert_array_equal(outs["bf16"][1], outs["fp32"][1])


def test_mlp_supported_gating(monkeypatch):
    from types import SimpleNamespace

    dataset, model, _, _ = setup()
    cfg = SimpleNamespace(batch_size=100, mesh="")
    ok, why = mlp_pallas_supported(model, dataset, cfg)
    assert not ok and "TPU" in why  # conftest forces CPU
    # The backend check short-circuits on CPU, making the config-logic
    # assertions vacuous — pretend we're on TPU so the real gates run.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ok, _ = mlp_pallas_supported(model, dataset, cfg)
    assert ok
    # pure-linear config routed to the linear kernel, not this one
    lin = build_vae(data_dim=dataset.dimension, latent_dim=LATENT)
    ok, why = mlp_pallas_supported(lin, dataset, cfg)
    assert not ok and "linear kernel" in why
    # too-wide hidden layers rejected
    wide = build_vae(data_dim=dataset.dimension, latent_dim=LATENT,
                     encoder_layer_sizes="600|600",
                     decoder_layer_sizes="600|600")
    ok, why = mlp_pallas_supported(wide, dataset, cfg)
    assert not ok and "too wide" in why


def test_mlp_packed_windows_match_xla():
    """The MLP kernel's PACKED noise branch (sphere manifold from the
    rolled upper window, z2/z1 from the lower windows), pinned on CPU via
    the raw-pair hook — see test_pallas_kernel.py::
    test_packed_windows_match_xla_math for the linear-kernel twin."""
    n_steps = 4
    dataset, model, tx, state = setup(tdv=True)
    D = dataset.dimension
    enc_dims = _layer_dims(model.encoder_features, D)
    dec_dims = _layer_dims(model.decoder_features, LATENT)

    rng = np.random.RandomState(11)
    a_blk = rng.randn(n_steps, BATCH, LANE).astype(np.float32)
    b_blk = rng.randn(n_steps, BATCH, LANE).astype(np.float32)

    # numpy recomputation of the packed windows (half-lane shift is
    # direction-agnostic, so np.roll pins pltpu.roll either way)
    up_a = np.roll(a_blk, LANE // 2, axis=-1)
    g = up_a[:, :, : dataset.dim]
    xs = np.zeros((n_steps, BATCH, D), np.float32)
    xs[:, :, : dataset.dim] = g / np.linalg.norm(g, axis=-1, keepdims=True)
    z1s = b_blk[:, :, :LATENT]
    z2s = a_blk[:, :, :D]

    packed = pack_mlp_state(state, enc_dims, dec_dims, True)
    new_packed, losses = run_mlp_fused_chunk(
        n_steps=n_steps,
        seed_and_t0=jnp.array([13, 0], jnp.int32),
        a_t=jnp.zeros((LANE, LANE), jnp.float32),
        packed=packed,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        enc_dims=enc_dims, dec_dims=dec_dims,
        dataset_kind="sphere", intrinsic_dim=dataset.dim, var_added=0.0,
        eps_const=-3.0, tdv=True, lr=1e-3,
        external_raw_noise=(jnp.asarray(a_blk), jnp.asarray(b_blk)),
        interpret=True,
    )
    kstate = unpack_mlp_state(state, new_packed, n_steps, enc_dims, dec_dims,
                              True, LATENT)
    xparams, xopt, xlosses = run_xla_steps(
        model, tx, state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(np.asarray(losses), xlosses, rtol=3e-4,
                               atol=3e-4)
    assert_trees_close(kstate.params, xparams, rtol=1e-3, atol=1e-5)
