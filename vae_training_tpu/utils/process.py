"""Multi-process (multi-host) role helpers.

In a ``jax.distributed`` run every process executes the same program — all
processes must participate in every collective device computation — but
host-side effects (artifact files, checkpoints, console stats) must happen
exactly once. The reference is single-process (its only distributed gesture
is the dead pmean hook at /root/reference/utils.py:215-221); here process 0
is the writer, the idiomatic JAX multi-host convention.
"""

from __future__ import annotations

import jax


def is_primary() -> bool:
    """True iff this is the artifact-writing process (process_index 0;
    trivially True in single-process runs)."""
    return jax.process_index() == 0


def check_shared_fs(exists: bool, path: str, what: str = "checkpoint") -> None:
    """Make the multi-process restore path's shared-filesystem assumption
    EXPLICIT. Every process restores a checkpoint itself (device state must
    be rebuilt on every host), which silently requires ``path`` on a
    filesystem visible to all of them — on a pod with per-host disks,
    process>0 would crash on the read, or worse, a missing file on a
    non-primary could silently fork the run. Allgather the local visibility
    bit and fail with the requirement spelled out when processes disagree.
    No-op single-process."""
    if jax.process_count() == 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    flags = np.asarray(
        multihost_utils.process_allgather(np.int32(bool(exists)))
    ).reshape(-1)
    if flags.min() != flags.max():
        have = [i for i, f in enumerate(flags) if f]
        missing = [i for i, f in enumerate(flags) if not f]
        raise ValueError(
            f"multihost restore: the {what} at {path!r} is visible to "
            f"process(es) {have} but NOT to {missing}. Multi-process "
            f"--resume/--state_dict requires the run directory on a SHARED "
            f"filesystem mounted on every host — each process restores the "
            f"checkpoint itself; divergent visibility would crash the "
            f"missing process or silently fork the run."
        )
