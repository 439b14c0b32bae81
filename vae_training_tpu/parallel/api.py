"""Parallel backend selection.

``dp=N`` alone → explicit shard_map data parallelism (per-device samplers,
one gradient pmean per step). Any spec with ``tp`` → GSPMD compiler
partitioning over the full dp×tp mesh. Multi-host process bring-up
(``jax.distributed.initialize``) is the caller's responsibility and is a
no-op on a single host.
"""

from __future__ import annotations

import optax

from ..data.base import DistributionDataset
from ..models.networks import VAE
from ..train.step import StepFns
from .dp import make_dp_step_fns
from .gspmd import make_gspmd_step_fns
from .mesh import make_mesh, parse_mesh_spec


def make_parallel_step_fns(
    model: VAE,
    dataset: DistributionDataset,
    tx: optax.GradientTransformation,
    batch_size: int,
    mesh_spec: str,
    devices=None,
    allow_uneven: bool = False,
    tp_allow_replicated: bool = False,
) -> StepFns:
    axes = parse_mesh_spec(mesh_spec)
    mesh = make_mesh(mesh_spec, devices=devices, allow_uneven=allow_uneven)
    if axes.get("tp", 1) > 1:
        return make_gspmd_step_fns(model, dataset, tx, batch_size, mesh,
                                   tp_allow_replicated=tp_allow_replicated)
    return make_dp_step_fns(model, dataset, tx, batch_size, mesh)
