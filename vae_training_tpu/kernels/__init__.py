"""Fused Pallas training kernels (lazy re-exports).

Submodules are imported on attribute access, NOT at package import time:
``dispatch.maybe_make_pallas_step_fns`` tolerates a jax install where
``jax.experimental.pallas.tpu`` fails to import (it falls back to the XLA
path), and an eager import here would defeat that guard by raising before
dispatch ever runs.
"""

_EXPORTS = {
    "maybe_make_pallas_step_fns": ".dispatch",
    "make_pallas_step_fns": ".linear_vae",
    "pallas_supported": ".linear_vae",
    "run_fused_chunk": ".linear_vae",
    "make_mlp_pallas_step_fns": ".mlp_vae",
    "mlp_pallas_supported": ".mlp_vae",
    "run_mlp_fused_chunk": ".mlp_vae",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        mod = importlib.import_module(_EXPORTS[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
