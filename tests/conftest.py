"""Test environment: 8 virtual CPU devices so mesh/shard_map code is
exercised without a TPU slice (the standard JAX fake-backend trick —
SURVEY.md §4). Must run before jax is imported anywhere."""

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
# Force EXACTLY 8 virtual devices: an inherited flag with a different
# count (left over from another project's shell) must be replaced, not
# kept — the mesh tests assume dp=8.
_flags = os.environ.get("XLA_FLAGS", "")
_flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", _flags)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8"
).strip()

# The axon sitecustomize registers a TPU backend and overrides
# jax_platforms to "axon,cpu"; force it back to cpu before backends
# initialize (the shared guard every entry point uses).
from vae_training_tpu._platform import honor_platform_env

honor_platform_env()

import matplotlib

matplotlib.use("Agg")

import pytest  # noqa: E402


@pytest.fixture
def tmp_outdir(tmp_path):
    return str(tmp_path)
