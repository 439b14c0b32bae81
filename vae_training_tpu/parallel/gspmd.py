"""GSPMD (compiler-partitioned) training: dp × tp meshes.

For MLP configs large enough to shard (e.g. the sphere sweep's 200³
encoder/decoder), tensor parallelism shards the Dense kernels across a
``tp`` mesh axis in alternating column-/row-parallel fashion (Megatron
pattern) and the batch across ``dp``; XLA's SPMD partitioner inserts the
activation/gradient collectives. No communication code is written by hand —
the sharding annotations ARE the parallelism specification.
"""

from __future__ import annotations

import sys
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


def _shardable(spec: P, leaf, tp: int, path=None, dropped=None,
               quiet: bool = False) -> P:
    """Resolve a requested spec against the leaf's actual shape.

    A ``tp`` axis that does not divide its dimension cannot be sharded; the
    parameter trains REPLICATED. Replicating a small head/bias is normal
    Megatron practice, but it must never be silent: each drop is recorded
    in ``dropped`` and announced on stderr (``quiet`` suppresses the note
    for the Adam-moment trees, which mirror params and would triple it)."""
    dims = tuple(spec)
    out = []
    for i, axis in enumerate(dims):
        if axis == "tp" and (i >= leaf.ndim or leaf.shape[i] % tp != 0):
            name = jax.tree_util.keystr(path) if path else "<param>"
            shape = tuple(getattr(leaf, "shape", ()))
            if dropped is not None:
                dropped.append((name, shape))
            if not quiet:
                print(
                    f"[tp] parameter {name} (shape {shape}) is not "
                    f"divisible by tp={tp}; training it REPLICATED",
                    file=sys.stderr, flush=True,
                )
            out.append(None)
        else:
            out.append(axis)
    while len(out) > leaf.ndim:
        out.pop()
    return P(*out)


def param_sharding_tree(params, mesh: Mesh, allow_replicated: bool = False,
                        quiet: bool = False):
    """Sharding tree for a param pytree under the Megatron column/row rule.

    Guards against SILENT tensor-parallelism loss (the same class the mesh
    -1 wildcard guard kills, parallel/mesh.py:100-114): every tp sharding
    dropped for non-divisibility gets a loud stderr note, and if the drops
    leave ZERO parameters tp-sharded — e.g. ``--mesh tp=3`` on the 200-wide
    sphere layers, which would train fully replicated at tp=1 speed — it is
    an error unless ``allow_replicated`` (CLI: ``--tp_allow_replicated``)."""
    tp = mesh.shape.get("tp", 1)
    dropped: list = []
    sharded = [0]

    def one(path, leaf):
        spec = _param_spec(path, leaf) if tp > 1 else P()
        spec = _shardable(spec, leaf, tp, path=path, dropped=dropped,
                          quiet=quiet)
        if "tp" in tuple(spec):
            sharded[0] += 1
        return NamedSharding(mesh, spec)

    tree = jax.tree_util.tree_map_with_path(one, params)
    if tp > 1 and dropped and sharded[0] == 0 and not allow_replicated:
        names = ", ".join(f"{n}{s}" for n, s in dropped)
        raise ValueError(
            f"tensor parallelism tp={tp} shards ZERO parameters: every "
            f"requested sharding was dropped for non-divisibility "
            f"({names}). The model would train fully replicated at tp=1 "
            f"speed — pick a tp that divides the layer widths, or pass "
            f"--tp_allow_replicated to accept it."
        )
    return tree


def state_sharding_tree(state: TrainState, mesh: Mesh,
                        allow_replicated: bool = False):
    """Shardings for the full TrainState: params + Adam moments sharded by
    the param rule (their trees mirror params), everything else replicated."""
    param_sh = param_sharding_tree(state.params, mesh,
                                   allow_replicated=allow_replicated)
    replicated = NamedSharding(mesh, P())

    def opt_entry(s):
        if isinstance(s, optax.ScaleByAdamState):
            # moments mirror params: same divisibility outcome, so pass
            # allow_replicated quietly (params above already raised/warned)
            return optax.ScaleByAdamState(
                count=replicated,
                mu=param_sharding_tree(s.mu, mesh, allow_replicated=True,
                                       quiet=True),
                nu=param_sharding_tree(s.nu, mesh, allow_replicated=True,
                                       quiet=True),
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
    tp_allow_replicated: bool = False,
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
        return jax.device_put(
            state,
            state_sharding_tree(state, mesh,
                                allow_replicated=tp_allow_replicated))

    return StepFns(
        train_chunk=train_chunk,
        eval_loss=base.eval_loss,
        generate=base.generate,
        score=base.score,
        loss_and_grads=base.loss_and_grads,
        eval_step=base.eval_step,
        place_state=place,
    )
