"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding path can
be exercised without TPU hardware. float64 is enabled so f64 runs can be
compared exactly against the NumPy oracle.
"""

import os

# Must be set before the backend initializes (first jax.devices() call).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin (axon) force-sets JAX_PLATFORMS in the parent
# env; override through the config API, which wins after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
