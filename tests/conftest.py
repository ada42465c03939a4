"""Test harness config: force an 8-device virtual CPU mesh BEFORE jax import.

Multi-chip sharding tests run against ``xla_force_host_platform_device_count``
fakes per the driver contract; unit tests also run on CPU so the suite is
hermetic and TPU-independent.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's axon sitecustomize force-registers the TPU platform and
# overrides JAX_PLATFORMS from the env, so pin CPU through the config API
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
