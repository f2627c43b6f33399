"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh (the driver
separately dry-runs the multichip path); numerics tests run on CPU for
determinism and speed.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
# start; re-pin to cpu before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
