"""Test harness config: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI; sharding/pjit tests run on a
virtual 8-device CPU mesh exactly as the driver's dryrun does. Must run before
jax initializes its backends, hence module-level in conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend and sets
# JAX_PLATFORMS=axon; config.update after import (before first backend use)
# reliably forces the virtual 8-device CPU platform for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
