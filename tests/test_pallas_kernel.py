"""Fused Pallas linear-VAE kernel: math equivalence against the XLA path.

Runs in interpreter mode on CPU with EXTERNAL noise (the kernel's test
hook), so the exact same (x, z1, z2) streams feed both the fused kernel and
the reference XLA train step — losses, parameters, and Adam moments must
then agree to float tolerance. The in-kernel PRNG path is exercised on real
TPU hardware (see bench.py / the TPU smoke run); its correctness reduces to
this math plus Box-Muller, which is tested statistically below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_training_tpu.data import LinearGaussianDataset
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
DATA_DIM = 12
LATENT = 20
INTRINSIC = 3


def setup(tdv=True, lr=1e-3):
    dataset = LinearGaussianDataset.create(
        2, dimension=INTRINSIC, intrinsic_dimension=INTRINSIC,
        padding_dimension=DATA_DIM - INTRINSIC,
    )
    model = build_vae(
        data_dim=dataset.dimension, latent_dim=LATENT,
        encoder_layer_sizes="", decoder_layer_sizes="",
        epsilon=-1.0, tunable_decoder_var=tdv,
    )
    tx = optax.adam(lr)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, DATA_DIM)), jnp.zeros((1, LATENT)),
        jnp.zeros((1, DATA_DIM)),
    )["params"]
    state = TrainState.create(
        params=params, tx=tx,
        model_key=jax.random.PRNGKey(1), data_key=jax.random.PRNGKey(2),
    )
    return dataset, model, tx, state


def pad_noise(x, z1, z2, n_steps):
    """Embed (n_steps, BATCH, d) noise into (n_steps, N, N) kernel blocks."""
    def emb(a):
        out = np.zeros((n_steps, N, N), np.float32)
        out[:, : a.shape[1], : a.shape[2]] = a
        return jnp.asarray(out)

    return emb(x), emb(z1), emb(z2)


def run_xla_steps(model, dataset, tx, state, xs, z1s, z2s):
    """Reference path: optax + jax.grad on the exact same noise."""
    from vae_training_tpu.ops import elbo_terms

    def loss_fn(params, batch, z1, z2):
        x_hat, mu, logvar_e, epsilon = model.apply(
            {"params": params}, batch, z1, z2)
        loss, _, _ = elbo_terms(batch, x_hat, mu, logvar_e, epsilon)
        return loss

    params, opt_state = state.params, state.opt_state
    losses = []
    for i in range(xs.shape[0]):
        loss, grads = jax.value_and_grad(loss_fn)(params, xs[i], z1s[i], z2s[i])
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return params, opt_state, np.array(losses)


@pytest.mark.parametrize("tdv", [True, False])
def test_kernel_matches_xla_math(tdv):
    n_steps = 5
    dataset, model, tx, state = setup(tdv=tdv)
    rng = np.random.RandomState(0)
    xs_small = (rng.randn(n_steps, BATCH, INTRINSIC).astype(np.float32)
                @ np.asarray(dataset.A.T))
    xs = np.zeros((n_steps, BATCH, DATA_DIM), np.float32)
    xs[:, :, :INTRINSIC] = xs_small  # zero ambient padding dims
    z1s = rng.randn(n_steps, BATCH, LATENT).astype(np.float32)
    z2s = rng.randn(n_steps, BATCH, DATA_DIM).astype(np.float32)

    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)
    buffers = pack_state(state, DATA_DIM, LATENT, tdv)
    *new_buffers, losses = run_fused_chunk(
        n_steps=n_steps,
        seed_and_t0=jnp.array([123, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32),  # unused with external noise
        we=buffers[0], wd=buffers[1], vec=buffers[2],
        mwe=buffers[3], vwe=buffers[4], mwd=buffers[5], vwd=buffers[6],
        mvec=buffers[7], vvec=buffers[8],
        batch=BATCH, data_dim=DATA_DIM, latent_dim=LATENT,
        intrinsic_dim=INTRINSIC, var_added=0.0, eps_const=-1.0,
        tdv=tdv, lr=1e-3,
        external_noise=(xp, z1p, z2p),
        interpret=True,
    )
    kstate = unpack_state(state, new_buffers, n_steps, DATA_DIM, LATENT, tdv)

    xparams, xopt, xlosses = run_xla_steps(
        model, dataset, tx,
        state, jnp.asarray(xs), jnp.asarray(z1s), jnp.asarray(z2s))

    np.testing.assert_allclose(np.asarray(losses), xlosses, rtol=2e-4, atol=2e-4)

    flat_k = jax.tree_util.tree_leaves_with_path(kstate.params)
    flat_x = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(xparams)}
    for path, val in flat_k:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_x[key]),
            rtol=5e-4, atol=5e-5, err_msg=key,
        )

    # Adam moments agree too
    ka, xa = _adam_state(kstate.opt_state), _adam_state(xopt)
    assert int(ka.count) == int(xa.count) == n_steps
    for tree_k, tree_x in [(ka.mu, xa.mu), (ka.nu, xa.nu)]:
        fk = jax.tree_util.tree_leaves_with_path(tree_k)
        fx = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(tree_x)}
        for path, val in fk:
            np.testing.assert_allclose(
                np.asarray(val), np.asarray(fx[jax.tree_util.keystr(path)]),
                rtol=5e-4, atol=1e-6, err_msg=jax.tree_util.keystr(path),
            )


def test_padded_regions_stay_zero():
    n_steps = 3
    dataset, model, tx, state = setup(tdv=True)
    rng = np.random.RandomState(1)
    xs = np.zeros((n_steps, BATCH, DATA_DIM), np.float32)
    xs[:, :, :INTRINSIC] = (rng.randn(n_steps, BATCH, INTRINSIC)
                            .astype(np.float32) @ np.asarray(dataset.A.T))[..., :INTRINSIC]
    z1s = rng.randn(n_steps, BATCH, LATENT).astype(np.float32)
    z2s = rng.randn(n_steps, BATCH, DATA_DIM).astype(np.float32)
    xp, z1p, z2p = pad_noise(xs, z1s, z2s, n_steps)
    buffers = pack_state(state, DATA_DIM, LATENT, True)
    *new_buffers, _ = run_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([1, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32),
        we=buffers[0], wd=buffers[1], vec=buffers[2],
        mwe=buffers[3], vwe=buffers[4], mwd=buffers[5], vwd=buffers[6],
        mvec=buffers[7], vvec=buffers[8],
        batch=BATCH, data_dim=DATA_DIM, latent_dim=LATENT,
        intrinsic_dim=INTRINSIC, var_added=0.0, eps_const=-1.0,
        tdv=True, lr=1e-3, external_noise=(xp, z1p, z2p), interpret=True,
    )
    we, wd, vec = (np.asarray(b) for b in new_buffers[:3])
    assert np.all(we[DATA_DIM:, :] == 0) and np.all(we[:, LATENT:] == 0)
    assert np.all(wd[LATENT:, :] == 0) and np.all(wd[:, DATA_DIM:] == 0)
    assert np.all(vec[0, LATENT:] == 0)  # be padding
    assert np.all(vec[1, DATA_DIM:] == 0)  # bd padding
    assert np.all(vec[2, LATENT:] == 0)  # epsilon_p padding
    assert np.all(vec[4:, :] == 0)  # unused rows


def test_pallas_supported_gating():
    from types import SimpleNamespace

    from vae_training_tpu.kernels.linear_vae import pallas_supported

    dataset, model, tx, state = setup()
    cfg = SimpleNamespace(batch_size=100, mesh="")
    ok, why = pallas_supported(model, dataset, cfg)
    # On the CPU test backend the kernel is gated off; the reason must be
    # the backend, not the config.
    if jax.default_backend() != "tpu":
        assert not ok and "TPU" in why
    # MLP configs are rejected regardless of backend
    mlp = build_vae(data_dim=dataset.dimension, latent_dim=LATENT,
                    encoder_layer_sizes="64", decoder_layer_sizes="64")
    ok, why = pallas_supported(mlp, dataset, cfg)
    assert not ok
