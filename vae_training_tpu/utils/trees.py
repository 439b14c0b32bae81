"""Pytree math utilities.

``correlation_ratio`` generalizes the reference's hand-rolled per-parameter
landscape diagnostic (/root/reference/vae.py:143-179) to arbitrary pytrees:

    ratio = -⟨∇loss(θ), θ* − θ⟩ / ‖θ* − θ‖²

measuring how well the negative gradient at θ points toward the final
parameters θ*. (The reference flips the sign on its 'epsilon' term —
vae.py:171 — in a code path that never executes; we use the consistent
formula for every leaf.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_vdot(a, b) -> jax.Array:
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32)), a, b
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves, jnp.float32(0.0))


def tree_sq_norm(a) -> jax.Array:
    return tree_vdot(a, a)


def correlation_ratio(opt_params, params, grads) -> jax.Array:
    displacement = jax.tree_util.tree_map(
        lambda o, p: o - p, opt_params, params
    )
    inner = -tree_vdot(grads, displacement)
    return inner / tree_sq_norm(displacement)


def sin_theta_distance(A: jnp.ndarray, B: jnp.ndarray) -> jax.Array:
    """Sin-theta subspace distance between (column spaces of) A and B.

    Reference: /root/reference/utils.py:317-325 (assumes orthogonal inputs).
    """
    U, _, _ = jnp.linalg.svd(A)
    Up, _, _ = jnp.linalg.svd(B)
    return 0.5 * jnp.linalg.norm(U - Up, ord="fro")
