"""Fused Pallas linear-VAE kernel: math equivalence against the XLA path.

Runs in interpreter mode on CPU with EXTERNAL noise (the kernel's test
hook), so the exact same (x, z1, z2) streams feed both the fused kernel and
the reference XLA train step — losses, parameters, and Adam moments must
then agree to float tolerance. Covers the plain linear-gaussian configs and
the sigmoid dual-decoder configs. The in-kernel PRNG path is exercised on
real TPU hardware (see bench.py / the TPU smoke runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_training_tpu.data import LinearGaussianDataset, SigmoidDataset
from vae_training_tpu.kernels.linear_vae import (
    N,
    _adam_state,
    pack_state,
    run_fused_chunk,
    unpack_state,
)
from vae_training_tpu.models import build_vae
from vae_training_tpu.train import TrainState, make_step_fns

BATCH = 32
LATENT = 20
INTRINSIC = 3


def setup(kind="linear", tdv=True, lr=1e-3, adam_dtype="f32"):
    if kind == "linear":
        dataset = LinearGaussianDataset.create(
            2, dimension=INTRINSIC, intrinsic_dimension=INTRINSIC,
            padding_dimension=9,
        )
        dataset_name = None
    else:
        dataset = SigmoidDataset.create(2, dimension=INTRINSIC,
                                        padding_dimension=8)
        dataset_name = "sigmoid"
    model = build_vae(
        data_dim=dataset.dimension, latent_dim=LATENT,
        encoder_layer_sizes="", decoder_layer_sizes="",
        epsilon=-1.0, tunable_decoder_var=tdv, dataset_name=dataset_name,
    )
    from vae_training_tpu.train.state import make_adam

    tx = make_adam(lr, adam_dtype)  # == optax.adam(lr) for f32
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


def sample_noise(dataset, n_steps, seed=0):
    """Host-side draws of (x, z1, z2) in the real (unpadded) shapes."""
    rng = np.random.RandomState(seed)
    D = dataset.dimension
    if isinstance(dataset, SigmoidDataset):
        z = rng.randn(n_steps, BATCH, dataset.dim).astype(np.float32)
        sig = 1 / (1 + np.exp(-(z @ np.asarray(dataset.A))))
        pad = np.zeros((n_steps, BATCH, D - dataset.dim - 1), np.float32)
        xs = np.concatenate([z, sig, pad], axis=-1)
    else:
        lat = rng.randn(n_steps, BATCH, dataset.intrinsic_dim).astype(np.float32)
        xs = np.zeros((n_steps, BATCH, D), np.float32)
        xs[:, :, : dataset.dim] = lat @ np.asarray(dataset.A.T)
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
    return _pad_noise(x, z1, z2, n_steps, batch=BATCH, lane=N)


def run_kernel(dataset, model, state, xs, z1s, z2s, tdv, dual):
    n_steps = xs.shape[0]
    D = dataset.dimension
    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)
    buffers = pack_state(state, D, LATENT, tdv, dual=dual)
    new_buffers, losses = run_fused_chunk(
        n_steps=n_steps,
        seed_and_t0=jnp.array([123, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32),  # unused with external noise
        buffers=buffers,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        intrinsic_dim=INTRINSIC, var_added=0.0, eps_const=-1.0,
        tdv=tdv, lr=1e-3, dual=dual,
        external_noise=(xp, z1p, z2p),
        interpret=True,
    )
    kstate = unpack_state(state, new_buffers, n_steps, D, LATENT, tdv,
                          dual=dual)
    return kstate, np.asarray(losses)


@pytest.mark.parametrize("kind,tdv,adam_dtype", [
    ("linear", True, "f32"), ("linear", False, "f32"),
    ("sigmoid", True, "f32"),
    # --adam_dtype bf16: weight-matrix moments stored bf16 — the kernel and
    # the XLA optax chain must round IDENTICALLY (assert_adam_moments pins
    # bf16 leaves bitwise)
    ("linear", True, "bf16"), ("sigmoid", True, "bf16"),
])
def test_kernel_matches_xla_math(kind, tdv, adam_dtype):
    n_steps = 5
    dataset, model, tx, state = setup(kind=kind, tdv=tdv,
                                      adam_dtype=adam_dtype)
    dual = kind == "sigmoid"
    xs, z1s, z2s = sample_noise(dataset, n_steps)
    kstate, klosses = run_kernel(dataset, model, state, xs, z1s, z2s, tdv, dual)
    xparams, xopt, xlosses = run_xla_steps(
        model, tx, state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(klosses, xlosses, rtol=2e-4, atol=2e-4)
    assert_trees_close(kstate.params, xparams, rtol=5e-4, atol=5e-5)
    ka, xa = _adam_state(kstate.opt_state), _adam_state(xopt)
    assert int(ka.count) == int(xa.count) == n_steps
    assert_adam_moments(ka, xa, mu_rtol=5e-4, mu_atol=1e-6,
                        nu_rtol=5e-4, nu_atol=1e-7)


def test_padded_regions_stay_zero():
    n_steps = 3
    dataset, model, tx, state = setup(kind="sigmoid", tdv=True)
    dual = True
    D = dataset.dimension
    xs, z1s, z2s = sample_noise(dataset, n_steps, seed=1)
    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)
    buffers = pack_state(state, D, LATENT, True, dual=dual)
    new_buffers, _ = run_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([1, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32), buffers=buffers,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        intrinsic_dim=INTRINSIC, var_added=0.0, eps_const=-1.0,
        tdv=True, lr=1e-3, dual=dual,
        external_noise=(xp, z1p, z2p), interpret=True,
    )
    we, wd, ws, vec = (np.asarray(b) for b in new_buffers[:4])
    assert np.all(we[D:, :] == 0) and np.all(we[:, LATENT:] == 0)
    assert np.all(wd[LATENT:, :] == 0) and np.all(wd[:, D:] == 0)
    assert np.all(ws[LATENT:, :] == 0) and np.all(ws[:, D:] == 0)
    assert np.all(vec[0, LATENT:] == 0)  # be padding
    assert np.all(vec[1, D:] == 0)  # bd padding
    assert np.all(vec[2, LATENT:] == 0)  # epsilon_p padding
    assert np.all(vec[4, D:] == 0)  # bs padding
    assert np.all(vec[5:, :] == 0)  # unused rows


def test_pallas_supported_gating(monkeypatch):
    from types import SimpleNamespace

    from vae_training_tpu.kernels.linear_vae import pallas_supported

    cfg = SimpleNamespace(batch_size=100, mesh="")
    dataset, model, _, _ = setup("linear")
    ok, why = pallas_supported(model, dataset, cfg)
    assert not ok and "TPU" in why  # conftest forces CPU
    sdataset, smodel, _, _ = setup("sigmoid")
    # The backend check short-circuits on CPU, which would make every
    # config-logic assertion below vacuous — pretend we're on TPU so the
    # ACTUAL gating logic runs and assert on the specific reasons.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    ok, _ = pallas_supported(model, dataset, cfg)
    assert ok
    ok, _ = pallas_supported(smodel, sdataset, cfg)
    assert ok
    # mismatched model/dataset pairs rejected
    ok, why = pallas_supported(model, sdataset, cfg)
    assert not ok and "dual decoder" in why
    ok, why = pallas_supported(smodel, dataset, cfg)
    assert not ok and "dual decoder" in why
    # MLP configs rejected
    mlp = build_vae(data_dim=dataset.dimension, latent_dim=LATENT,
                    encoder_layer_sizes="64", decoder_layer_sizes="64")
    ok, why = pallas_supported(mlp, dataset, cfg)
    assert not ok and "0-hidden-layer" in why
    # fully-supported pairs were accepted above under the fake TPU backend


@pytest.mark.parametrize("kind,var_added", [
    ("linear", 0.0), ("linear", 0.25), ("sigmoid", 0.0),
])
def test_packed_windows_match_xla_math(kind, var_added):
    """The PACKED noise branch's lane-window arithmetic, pinned on CPU.

    The packed production path derives all four noise consumers from one
    raw Box-Muller pair via disjoint lane windows + half-width rolls
    (_make_kernel.packed_sample) — a branch the plain external-noise hook
    bypasses. Here the RAW pair is supplied externally
    (external_raw_noise), the kernel runs the packed derivation verbatim
    in interpret mode, and the XLA reference is fed the numpy recomputation
    of the same windows — so a wrong roll, mask, or window overlap breaks
    this test rather than silently corrupting training statistics.
    """
    n_steps = 5
    dataset, model, tx, state = setup(kind=kind, tdv=True)
    dual = kind == "sigmoid"
    D = dataset.dimension
    rows = BATCH  # row_tile(32) == 32

    rng = np.random.RandomState(7)
    a_blk = rng.randn(n_steps, rows, N).astype(np.float32)
    b_blk = rng.randn(n_steps, rows, N).astype(np.float32)

    # numpy recomputation of the packed windows (shift N/2 is direction-
    # agnostic, so np.roll pins pltpu.roll regardless of its convention)
    up_a = np.roll(a_blk, N // 2, axis=-1)
    lat = up_a[:, :, :INTRINSIC]
    xs = np.zeros((n_steps, rows, D), np.float32)
    if kind == "sigmoid":
        sig = 1 / (1 + np.exp(-(lat @ np.asarray(dataset.A))))
        xs[:, :, : dataset.dim] = lat
        xs[:, :, dataset.dim: dataset.dim + 1] = sig
    else:
        xs[:, :, : dataset.dim] = lat @ np.asarray(dataset.A.T)
        if var_added > 0.0:
            up_b = np.roll(b_blk, N // 2, axis=-1)
            xs += up_b[:, :, :D] * np.float32(np.sqrt(var_added))
    z1s = b_blk[:, :, :LATENT]
    z2s = a_blk[:, :, :D]

    buffers = pack_state(state, D, LATENT, True, dual=dual)
    new_buffers, klosses = run_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([9, 0], jnp.int32),
        a_t=_pack_a_t(dataset, kind), buffers=buffers,
        batch=BATCH, data_dim=D, latent_dim=LATENT,
        intrinsic_dim=INTRINSIC, var_added=var_added, eps_const=-1.0,
        tdv=True, lr=1e-3, dual=dual,
        dataset_kind="sigmoid" if kind == "sigmoid" else "linear",
        external_raw_noise=(jnp.asarray(a_blk), jnp.asarray(b_blk)),
        interpret=True,
    )
    kstate = unpack_state(state, new_buffers, n_steps, D, LATENT, True,
                          dual=dual)
    xparams, xopt, xlosses = run_xla_steps(
        model, tx, state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(np.asarray(klosses), xlosses,
                               rtol=2e-4, atol=2e-4)
    assert_trees_close(kstate.params, xparams, rtol=5e-4, atol=5e-5)


def _pack_a_t(dataset, kind):
    """The kernel-side manifold matrix (manifold_rows packing contract)."""
    from vae_training_tpu.kernels.linear_vae import manifold_rows

    _, _, _, a_t = manifold_rows([dataset])
    return a_t[0]
