"""GSPMD (compiler-partitioned) training: dp × tp meshes.

For MLP configs large enough to shard (e.g. the sphere sweep's 200³
encoder/decoder), tensor parallelism shards the Dense kernels across a
``tp`` mesh axis in alternating column-/row-parallel fashion (Megatron
pattern) and the batch across ``dp``; XLA's SPMD partitioner inserts the
activation/gradient collectives. No communication code is written by hand —
the sharding annotations ARE the parallelism specification.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.base import DistributionDataset
from ..models.networks import VAE
from ..train.state import TrainState
from ..train.step import (StepFns, make_elbo_grad_fn, make_step_fns,
                          sample_z, split_z)


def _param_spec(path: Tuple, leaf) -> P:
    """PartitionSpec for one parameter leaf, by its tree path.

    Dense kernels alternate column-parallel (shard the output dim) and
    row-parallel (shard the input dim) by layer index; matching biases are
    sharded with their layer's output when column-parallel. Scalars/vectors
    (epsilon, epsilon_p) and degenerate dims stay replicated.
    """
    keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    keys = [k for k in keys if k is not None]
    layer = next((k for k in keys if str(k).startswith("FC")), None)
    if layer is None:
        return P()
    idx = int(str(layer)[2:])
    col_parallel = idx % 2 == 0
    kind = keys[-1]
    if kind == "kernel":
        return P(None, "tp") if col_parallel else P("tp", None)
    if kind == "bias":
        return P("tp") if col_parallel else P()
    return P()


def _shardable(spec: P, leaf, tp: int) -> P:
    """Drop shardings that don't divide the dimension evenly."""
    dims = tuple(spec)
    out = []
    for i, axis in enumerate(dims):
        if axis == "tp" and (i >= leaf.ndim or leaf.shape[i] % tp != 0):
            out.append(None)
        else:
            out.append(axis)
    while len(out) > leaf.ndim:
        out.pop()
    return P(*out)


def param_sharding_tree(params, mesh: Mesh):
    tp = mesh.shape.get("tp", 1)

    def one(path, leaf):
        spec = _param_spec(path, leaf) if tp > 1 else P()
        spec = _shardable(spec, leaf, tp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def state_sharding_tree(state: TrainState, mesh: Mesh):
    """Shardings for the full TrainState: params + Adam moments sharded by
    the param rule (their trees mirror params), everything else replicated."""
    param_sh = param_sharding_tree(state.params, mesh)
    replicated = NamedSharding(mesh, P())

    def opt_entry(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=replicated,
                mu=param_sharding_tree(s.mu, mesh),
                nu=param_sharding_tree(s.nu, mesh),
            )
        return jax.tree_util.tree_map(lambda _: replicated, s)

    opt_sh = jax.tree_util.tree_map(
        opt_entry,
        state.opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    )
    return TrainState(
        params=param_sh,
        opt_state=opt_sh,
        step=replicated,
        model_key=replicated,
        data_key=replicated,
    )


def make_gspmd_step_fns(
    model: VAE,
    dataset: DistributionDataset,
    tx: optax.GradientTransformation,
    batch_size: int,
    mesh: Mesh,
) -> StepFns:
    dp = mesh.shape.get("dp", 1) * mesh.shape.get("dp_dcn", 1)
    if batch_size % max(dp, 1) != 0:
        raise ValueError(f"--batch_size {batch_size} must be divisible by dp={dp}")
    latent_dim = model.latent_dim
    data_dim = dataset.dimension
    # two-level dp: batch shards over (dp_dcn, dp) jointly; GSPMD emits the
    # hierarchical reduction itself from the sharding annotations
    batch_axes = (("dp_dcn", "dp") if "dp_dcn" in mesh.shape else "dp")
    batch_sharding = NamedSharding(mesh, P(batch_axes, None))

    grad_fn = make_elbo_grad_fn(model)

    def train_step(state: TrainState):
        kb = jax.random.fold_in(state.data_key, state.step)
        kz = jax.random.fold_in(state.model_key, state.step)
        batch = dataset.sample(kb, batch_size)
        batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        z = sample_z(kz, batch_size, latent_dim, data_dim)
        z = jax.lax.with_sharding_constraint(z, batch_sharding)
        z1, z2 = split_z(z, latent_dim)
        loss, grads = grad_fn(state.params, batch, z1, z2)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnames=("state",))
    def train_chunk(state: TrainState, n_steps: int):
        def body(s, _):
            return train_step(s)

        return jax.lax.scan(body, state, None, length=n_steps)

    base = make_step_fns(model, dataset, tx, batch_size)

    def place(state: TrainState) -> TrainState:
        return jax.device_put(state, state_sharding_tree(state, mesh))

    return StepFns(
        train_chunk=train_chunk,
        eval_loss=base.eval_loss,
        generate=base.generate,
        score=base.score,
        loss_and_grads=base.loss_and_grads,
        eval_step=base.eval_step,
        place_state=place,
    )
