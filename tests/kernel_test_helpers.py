"""Shared helpers for the kernel math-equivalence suites.

One definition of the XLA/optax reference step, the noise-tile embedding,
and the labeled tree comparison — test_pallas_kernel.py, test_mlp_kernel.py,
and test_kernel_shapes_property.py alias these (the grid-equivalence suite
imports them through those modules), so a change to the reference step or
the kernel padding layout lands everywhere at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def pad_noise(x, z1, z2, n_steps, *, batch, lane):
    """Embed (n_steps, batch, d) noise into the kernels' (rows, lane)
    zero-padded blocks, rows = the batch's 8-aligned row tile."""
    from vae_training_tpu.kernels.linear_vae import row_tile

    rows = row_tile(batch)

    def emb(a):
        out = np.zeros((n_steps, rows, lane), np.float32)
        out[:, : a.shape[1], : a.shape[2]] = a
        return jnp.asarray(out)

    return emb(x), emb(z1), emb(z2)


def run_xla_steps(model, tx, state, xs, z1s, z2s):
    """The jax.grad+optax reference trajectory the kernels are pinned to."""
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


def _bf16_ulp_keys(a):
    """bfloat16 array -> int32 keys monotonic in float order, 1 apart per
    ulp (the standard sign-magnitude -> two's-complement bit trick)."""
    s = np.asarray(a).view(np.int16).astype(np.int32)
    return np.where(s < 0, -32768 - s, s)


def assert_adam_moments(ka, xa, *, mu_rtol, mu_atol, nu_rtol, nu_atol,
                        bf16_mode="strict"):
    """Pin kernel vs XLA Adam moments, dtype-aware. bf16 moment leaves
    (--adam_dtype bf16): both paths round the same f32 update to bf16, and
    the rounding absorbs the paths' float-tolerance forward differences —
    so every element must agree to <=1 bf16 ulp (a tolerance-level gradient
    difference can land exactly on a rounding boundary) and the
    overwhelming majority must be BITWISE equal. f32 leaves keep the usual
    tolerance (params diverge at rounding level, so grads/moments do).

    ``bf16_mode="drift"`` (the shape FUZZ uses it): in wide networks a
    legitimate 1-ulp boundary flip perturbs the params, and the perturbed
    params produce later-step gradients that differ beyond comparison
    tolerance — a chaos cascade, not a kernel error (signature: nu stays
    bitwise-equal and params stay at float tolerance while a few scattered
    mu elements drift). Drift mode keeps the >=95% bitwise requirement but
    bounds the non-bitwise tail by |diff| <= max(1e-3, 0.02*|x|) instead
    of <=1 ulp."""
    for kt, xt, rtol, atol in ((ka.mu, xa.mu, mu_rtol, mu_atol),
                               (ka.nu, xa.nu, nu_rtol, nu_atol)):
        flat_x = {jax.tree_util.keystr(p): v
                  for p, v in jax.tree_util.tree_leaves_with_path(xt)}
        for path, kv in jax.tree_util.tree_leaves_with_path(kt):
            key = jax.tree_util.keystr(path)
            xv = flat_x[key]
            assert kv.dtype == xv.dtype, (key, kv.dtype, xv.dtype)
            if kv.dtype == jnp.bfloat16:
                ulp = np.abs(_bf16_ulp_keys(kv) - _bf16_ulp_keys(xv))
                # near-zero exemption: a tolerance-level f32 forward
                # difference on a TINY moment (|m| ~ atol) maps to a huge
                # bf16 ulp distance (ulp spacing shrinks with magnitude)
                # while being absolutely negligible — ulp-compare only
                # where the values differ by more than the f32 atol
                kf = np.asarray(kv, np.float32)
                xf = np.asarray(xv, np.float32)
                diff = np.abs(kf - xf)
                big = diff > atol
                if bf16_mode == "strict":
                    worst = int(ulp[big].max(initial=0))
                    assert worst <= 1, (
                        f"{key}: bf16 moments differ by {worst} ulp above "
                        f"the {atol} absolute floor (max allowed 1)")
                else:  # drift: bound the boundary-flip cascade (docstring)
                    bound = np.maximum(1e-3, 0.02 * np.abs(xf))
                    worst = float((diff / bound).max())
                    assert worst <= 1.0, (
                        f"{key}: bf16 moment drift {worst:.2f}x the "
                        f"cascade bound max(1e-3, 0.02|x|)")
                exact = float(np.mean(ulp == 0))
                assert exact >= 0.95, (
                    f"{key}: only {exact:.1%} of bf16 moments bitwise-equal "
                    f"(boundary flips should be rare)")
            else:
                np.testing.assert_allclose(
                    np.asarray(kv), np.asarray(xv), rtol=rtol, atol=atol,
                    err_msg=key)


def assert_trees_close(a, b, rtol, atol):
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(b)}
    for path, val in jax.tree_util.tree_leaves_with_path(a):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_b[key]),
            rtol=rtol, atol=atol, err_msg=key,
        )
