"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled so that
(a) multi-chip sharding logic is exercised without TPU hardware and
(b) host-factorization math runs at the reference's float64 accuracy
(reference is f64 end-to-end via BF_DOUBLE, meson.build:25).
"""

import os

# XLA_FLAGS must be set before the backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# NOTE: this box pins JAX_PLATFORMS=axon in the environment and the plugin
# wins over os.environ at import time — only the config update reliably
# forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
