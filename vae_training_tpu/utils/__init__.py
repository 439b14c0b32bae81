from .trees import correlation_ratio, sin_theta_distance, tree_sq_norm, tree_vdot

__all__ = [
    "correlation_ratio",
    "sin_theta_distance",
    "tree_sq_norm",
    "tree_vdot",
]
