from .loop import EVAL_BATCH_SIZE, N_PLOT, N_PRINT, Trainer
from .state import TrainState
from .step import StepFns, make_step_fns, sample_z, split_z

__all__ = [
    "Trainer",
    "TrainState",
    "StepFns",
    "make_step_fns",
    "sample_z",
    "split_z",
    "N_PLOT",
    "N_PRINT",
    "EVAL_BATCH_SIZE",
]
