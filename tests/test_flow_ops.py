"""Flow building blocks: invertibility, masks, squeeze, cross-device hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vae_training_tpu.ops.flows import (
    InvertibleBatchNorm,
    compute_accuracy,
    cross_entropy_loss,
    get_mask,
    inv_batch_norm,
    inv_dense,
    inv_leaky_relu,
    leaky_relu,
    squeeze_2x2,
)


def test_leaky_relu_inverts():
    x = jnp.linspace(-3, 3, 31)
    np.testing.assert_allclose(
        np.asarray(inv_leaky_relu(leaky_relu(x))), np.asarray(x), rtol=1e-6)


def test_inv_dense():
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(4, 4), jnp.float32)
    b = jnp.asarray(rng.randn(4), jnp.float32)
    x = jnp.asarray(rng.randn(8, 4), jnp.float32)
    y = x @ W + b
    np.testing.assert_allclose(
        np.asarray(inv_dense(y, W, b)), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_invertible_batch_norm_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 6) * 3.0 + 2.0, jnp.float32)
    bn = InvertibleBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x)
    y, mutated = bn.apply(variables, x, mutable=["batch_stats"])
    # normalized output: ~zero mean, ~unit variance
    assert abs(float(y.mean())) < 1e-5
    assert abs(float(y.var()) - 1.0) < 1e-2
    x_rec = inv_batch_norm(
        y, variables["params"], mutated["batch_stats"])
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # running averages moved toward batch moments
    assert float(jnp.abs(mutated["batch_stats"]["mean"]).sum()) > 0


def test_invertible_batch_norm_cross_device_pmean():
    """axis_name hook: moments reduced across a shard_map mesh axis."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    bn = InvertibleBatchNorm(axis_name="dp")
    x = jnp.asarray(np.random.RandomState(0).randn(64, 6), jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x[:16])

    def f(xs):
        y, mut = bn.apply(variables, xs, mutable=["batch_stats"])
        return y, mut["batch_stats"]["recent_mul"]

    y, mul = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P("dp"),),
                      out_specs=(P("dp"), P("dp")), check_vma=False)
    )(x)
    # every device used the SAME (global) moments → identical recent_mul
    muls = np.asarray(mul).reshape(4, -1)
    for row in muls[1:]:
        np.testing.assert_allclose(muls[0], row, rtol=1e-6)
    # and the result equals single-device BN over the full batch
    # (same params; no axis_name outside the mesh context)
    y_ref, _ = InvertibleBatchNorm().apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_get_mask_checkerboard_and_channel():
    m = get_mask((4, 4, 2), reverse=False)
    assert m.shape == (4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(m[:2, :2, 0]), np.array([[0, 1], [1, 0]], np.float32))
    mr = get_mask((4, 4, 2), reverse=True)
    np.testing.assert_allclose(np.asarray(m + mr), np.ones((4, 4, 1)))
    ch = get_mask((4, 4, 4), reverse=False, use_checkerboard=False)
    assert ch.shape == (4, 4, 4)
    np.testing.assert_array_equal(np.asarray(ch[..., :2]), np.ones((4, 4, 2)))
    np.testing.assert_array_equal(np.asarray(ch[..., 2:]), np.zeros((4, 4, 2)))
    batched = get_mask((1, 4, 4, 2), reverse=False)
    assert batched.shape == (1, 4, 4, 1)


def test_squeeze_2x2_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
    s = squeeze_2x2(x)
    assert s.shape == (2, 4, 4, 12)
    back = squeeze_2x2(s, reverse=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    with pytest.raises(ValueError, match="divisible by 4"):
        squeeze_2x2(jnp.zeros((1, 4, 4, 3)), reverse=True)
    with pytest.raises(ValueError, match="even spatial"):
        squeeze_2x2(jnp.zeros((1, 5, 5, 3)))


def test_classifier_utils():
    logits = jnp.asarray([[1.0, 2.0, 3.0], [0.5, 0.1, 0.2]])
    labels = jnp.asarray([2, 0])
    np.testing.assert_allclose(
        np.asarray(cross_entropy_loss(logits, labels)), [-3.0, -0.5])
    assert float(compute_accuracy(logits, labels)) == 1.0
