"""Kernel backend dispatch: Pallas fused path where eligible, XLA otherwise.

``--kernels auto`` uses the Pallas fused multi-step kernel when the config
matches its support envelope (pure-linear encoder/decoder, the sweep-scale
shapes); ``--kernels pallas`` requires it (raising if unsupported);
``--kernels xla`` always uses the scan-based XLA path.
"""

from __future__ import annotations

from typing import Optional

from ..train.step import StepFns


def maybe_make_pallas_step_fns(
    model, dataset, tx, cfg, require: bool = False
) -> Optional[StepFns]:
    try:
        from .linear_vae import pallas_supported, make_pallas_step_fns
    except ImportError as e:
        if require:
            raise RuntimeError(f"--kernels pallas requested but unavailable: {e}")
        return None
    ok, why = pallas_supported(model, dataset, cfg)
    if not ok:
        if require:
            raise RuntimeError(f"--kernels pallas requested but unsupported: {why}")
        return None
    return make_pallas_step_fns(model, dataset, tx, cfg)
