from .checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from .export import load_model_pkl, save_model_pkl, to_reference_state_dict
from .outdir import get_output_dir, make_output_dir

__all__ = [
    "checkpoint_exists",
    "restore_checkpoint",
    "save_checkpoint",
    "load_model_pkl",
    "save_model_pkl",
    "to_reference_state_dict",
    "get_output_dir",
    "make_output_dir",
]
