from .dispatch import maybe_make_pallas_step_fns

__all__ = ["maybe_make_pallas_step_fns"]
