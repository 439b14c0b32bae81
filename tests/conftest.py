"""Test environment: 8 virtual CPU devices so mesh/shard_map code is
exercised without a TPU slice (the standard JAX fake-backend trick —
SURVEY.md §4). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize registers a TPU backend and overrides
# jax_platforms to "axon,cpu"; force it back to cpu post-import.
import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

import pytest  # noqa: E402


@pytest.fixture
def tmp_outdir(tmp_path):
    return str(tmp_path)
