"""Kernel backend dispatch: Pallas fused path where eligible, XLA otherwise.

``--kernels auto`` tries the fused kernels in order: the linear kernel
(pure-linear encoder/decoder on the linear_gaussian/sigmoid datasets) and
then the MLP kernel (ReLU MLP stacks on sphere/linear_gaussian, and the
sigmoid dataset's dual-decoder MLPs, hidden widths <= 512 after padding);
batch <= 128 for both. ``--kernels pallas``
requires one of them (raising with both reasons if unsupported);
``--kernels xla`` always uses the scan-based XLA path.
"""

from __future__ import annotations

from typing import Optional

from ..train.step import StepFns


def maybe_make_pallas_step_fns(
    model, dataset, tx, cfg, require: bool = False
) -> Optional[StepFns]:
    try:
        from .linear_vae import make_pallas_step_fns, pallas_supported
        from .mlp_vae import make_mlp_pallas_step_fns, mlp_pallas_supported
    except ImportError as e:
        if require:
            raise RuntimeError(f"--kernels pallas requested but unavailable: {e}")
        return None
    ok, why_linear = pallas_supported(model, dataset, cfg)
    if ok:
        return make_pallas_step_fns(model, dataset, tx, cfg)
    ok, why_mlp = mlp_pallas_supported(model, dataset, cfg)
    if ok:
        return make_mlp_pallas_step_fns(model, dataset, tx, cfg)
    if require:
        raise RuntimeError(
            "--kernels pallas requested but unsupported: "
            f"linear kernel: {why_linear}; mlp kernel: {why_mlp}"
        )
    return None
