"""Device mesh construction from a CLI spec string.

The reference has no distributed support at all (SURVEY.md §2.2); scale-out
here is the idiomatic TPU answer: a ``jax.sharding.Mesh`` over which the
fused train step is sharded, with XLA compiling the collectives onto ICI.

Spec grammar: comma-separated ``axis=size``, e.g. ``"dp=8"`` or
``"dp=4,tp=2"``. Supported axes: ``dp`` (data parallel: batch sharded,
gradients all-reduced) and ``tp`` (tensor parallel: MLP hidden dims
sharded, activation collectives inserted by GSPMD). ``axis=-1`` means "all
remaining devices".
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import Mesh

SUPPORTED_AXES = ("dp", "tp")


def parse_mesh_spec(spec: str) -> Dict[str, int]:
    axes: Dict[str, int] = {}
    if not spec:
        return axes
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"Bad mesh spec segment {part!r}; expected axis=size")
        name, size = part.split("=", 1)
        name = name.strip()
        if name not in SUPPORTED_AXES:
            raise ValueError(
                f"Unsupported mesh axis {name!r}; supported: {SUPPORTED_AXES}"
            )
        axes[name] = int(size)
    return axes


def make_mesh(spec: str, devices=None) -> Mesh:
    axes = parse_mesh_spec(spec)
    if not axes:
        raise ValueError("Empty mesh spec")
    devices = list(devices if devices is not None else jax.devices())
    known = int(np.prod([s for s in axes.values() if s > 0]))
    for name, size in axes.items():
        if size == -1:
            axes[name] = len(devices) // known
    total = int(np.prod(list(axes.values())))
    if total > len(devices):
        raise ValueError(
            f"Mesh {axes} needs {total} devices but only {len(devices)} available"
        )
    mesh_devices = np.array(devices[:total]).reshape(tuple(axes.values()))
    return Mesh(mesh_devices, tuple(axes.keys()))
