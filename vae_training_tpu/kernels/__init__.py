from .dispatch import maybe_make_pallas_step_fns
from .linear_vae import (
    make_pallas_step_fns,
    pallas_supported,
    run_fused_chunk,
)
from .mlp_vae import (
    make_mlp_pallas_step_fns,
    mlp_pallas_supported,
    run_mlp_fused_chunk,
)

__all__ = [
    "maybe_make_pallas_step_fns",
    "make_pallas_step_fns",
    "pallas_supported",
    "run_fused_chunk",
    "make_mlp_pallas_step_fns",
    "mlp_pallas_supported",
    "run_mlp_fused_chunk",
]
