"""Training state: one pytree carrying everything the fused step mutates.

Replaces the reference's scattered mutable host state (optimizer, model,
python-side PRNG key chains — /root/reference/model.py:29-34,57-59,
/root/reference/vae.py:112-129) with a single immutable pytree that lives on
device and is threaded through ``lax.scan``. PRNG: per-step keys are derived
by ``fold_in(base_key, step)`` so a scan chunk needs no host key splits.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct

# The framework's Adam hyperparameters (reference flax.optim.Adam defaults —
# /root/reference/vae.py:113). Single source of truth: the Pallas kernels
# implement Adam with THESE constants, so optimizer construction must go
# through make_adam() to keep kernel and XLA paths in sync.
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def make_adam(learning_rate: float) -> optax.GradientTransformation:
    return optax.adam(learning_rate, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    model_key: jax.Array  # base key for reparameterisation noise z
    data_key: jax.Array  # base key for on-device batch sampling

    @classmethod
    def create(cls, *, params, tx: optax.GradientTransformation, model_key, data_key):
        import jax.numpy as jnp

        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32),
            model_key=model_key,
            data_key=data_key,
        )
