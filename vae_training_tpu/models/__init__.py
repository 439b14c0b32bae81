from .networks import VAE, FullyConnectedNetwork, build_vae, parse_layer_sizes
from .warm_start import (
    apply_warm_start,
    warm_start_linear_gaussian,
    warm_start_sigmoid,
)

__all__ = [
    "VAE",
    "FullyConnectedNetwork",
    "build_vae",
    "parse_layer_sizes",
    "apply_warm_start",
    "warm_start_linear_gaussian",
    "warm_start_sigmoid",
]
