#!/usr/bin/env python
"""Sweep runner CLI — alias onto vae_training_tpu._scripts.sweep (see
run.py's shim note)."""
import sys

from vae_training_tpu._scripts import sweep as _impl

sys.modules[__name__] = _impl

if __name__ == "__main__":
    sys.exit(_impl.main())
