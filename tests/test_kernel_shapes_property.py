"""Property-style check: kernel/XLA equivalence holds across random shape
combinations (batch, data dim, latent dim, hidden widths), not just the
sweep shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_training_tpu.data import LinearGaussianDataset
from vae_training_tpu.kernels.linear_vae import (
    N,
    pack_state,
    run_fused_chunk,
    unpack_state,
)
from vae_training_tpu.models import build_vae
from vae_training_tpu.train import TrainState

CASES = [
    # (batch, dim, intrinsic, padding, latent)
    (7, 2, 2, 1, 3),
    (128, 28, 5, 17, 20),  # kernel max batch, sweep-max ambient
    (50, 13, 13, 0, 14),
]


@pytest.mark.parametrize("batch,dim,intrinsic,padding,latent", CASES)
def test_linear_kernel_equivalence_random_shapes(batch, dim, intrinsic,
                                                 padding, latent):
    dataset = LinearGaussianDataset.create(
        3, dimension=dim, intrinsic_dimension=intrinsic,
        padding_dimension=padding)
    D = dataset.dimension
    model = build_vae(data_dim=D, latent_dim=latent, epsilon=-1.0,
                      tunable_decoder_var=True)
    tx = optax.adam(1e-3)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, D)), jnp.zeros((1, latent)),
        jnp.zeros((1, D)))["params"]
    state = TrainState.create(
        params=params, tx=tx, model_key=jax.random.PRNGKey(1),
        data_key=jax.random.PRNGKey(2))

    n_steps = 3
    rng = np.random.RandomState(batch)
    lat = rng.randn(n_steps, batch, intrinsic).astype(np.float32)
    xs = np.zeros((n_steps, batch, D), np.float32)
    xs[:, :, :dim] = lat @ np.asarray(dataset.A.T)
    z1s = rng.randn(n_steps, batch, latent).astype(np.float32)
    z2s = rng.randn(n_steps, batch, D).astype(np.float32)

    from kernel_test_helpers import pad_noise

    noise = pad_noise(xs, z1s, z2s, n_steps, batch=batch, lane=N)
    buffers = pack_state(state, D, latent, True)
    new_buffers, losses = run_fused_chunk(
        n_steps=n_steps, seed_and_t0=jnp.array([5, 0], jnp.int32),
        a_t=jnp.zeros((N, N), jnp.float32), buffers=buffers,
        batch=batch, data_dim=D, latent_dim=latent, intrinsic_dim=intrinsic,
        var_added=0.0, eps_const=-1.0, tdv=True, lr=1e-3,
        external_noise=noise, interpret=True,
    )
    kstate = unpack_state(state, new_buffers, n_steps, D, latent, True)

    # XLA reference on the same noise
    from vae_training_tpu.ops import elbo_terms

    def loss_fn(p, b, z1, z2):
        x_hat, mu, lv, eps = model.apply({"params": p}, b, z1, z2)
        return elbo_terms(b, x_hat, mu, lv, eps)[0]

    p, o = state.params, state.opt_state
    xlosses = []
    for i in range(n_steps):
        l, g = jax.value_and_grad(loss_fn)(p, xs[i], z1s[i], z2s[i])
        u, o = tx.update(g, o, p)
        p = optax.apply_updates(p, u)
        xlosses.append(float(l))
    np.testing.assert_allclose(np.asarray(losses), xlosses, rtol=3e-4,
                               atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(kstate.params["Decoder"]["FC0"]["kernel"]),
        np.asarray(p["Decoder"]["FC0"]["kernel"]), rtol=1e-3, atol=2e-5)


def test_sin_theta_distance_and_constants():
    from vae_training_tpu.ops.flows import Constants
    from vae_training_tpu.utils import sin_theta_distance

    assert Constants.lambd == 10 and Constants.alpha == 0.1
    eye = jnp.eye(3)
    assert float(sin_theta_distance(eye, eye)) == 0.0
    rot = jnp.asarray([[0.0, -1.0, 0], [1.0, 0, 0], [0, 0, 1.0]])
    assert float(sin_theta_distance(eye, rot)) > 0.0
