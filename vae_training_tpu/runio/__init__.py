import os


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable jax's persistent compilation cache (idempotent).

    Sweeps run many processes/rows with identical programs; remote-compile
    TPU runtimes have high and variable compile latency, so caching cuts
    repeat compiles to ~0. Called by run.py and sweep.py.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VAE_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vae_tpu_xla"),
    )
    if not cache_dir:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


from .checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
)
from .export import load_model_pkl, save_model_pkl, to_reference_state_dict
from .outdir import get_output_dir, make_output_dir

__all__ = [
    "enable_compile_cache",
    "checkpoint_exists",
    "restore_checkpoint",
    "save_checkpoint",
    "save_checkpoint_async",
    "load_model_pkl",
    "save_model_pkl",
    "to_reference_state_dict",
    "get_output_dir",
    "make_output_dir",
]
