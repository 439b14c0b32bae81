"""JAX platform-selection guard, shared by every entry point.

The axon TPU sitecustomize overrides ``JAX_PLATFORMS=cpu`` from the
environment, and platform selection freezes at first backend use — so the
guard must run BEFORE flax/optax (or anything else that initializes
backends) is imported. This module imports only ``os`` and ``jax`` (and the
package ``__init__`` is docstring-only), making it safe to import first
from any script. See CLAUDE.md "Environment traps".
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Apply ``JAX_PLATFORMS=cpu`` via jax.config before backends init."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
