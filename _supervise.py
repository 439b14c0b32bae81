"""Shared child supervisor — alias onto vae_training_tpu._scripts._supervise
(see run.py's shim note)."""
import sys

from vae_training_tpu._scripts import _supervise as _impl

sys.modules[__name__] = _impl
