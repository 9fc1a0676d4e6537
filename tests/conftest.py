"""Test configuration.

Tests run on a virtual 8-device CPU mesh with x64 enabled so that
(a) multi-chip sharding logic is exercised without TPU hardware and
(b) host-factorization math runs at the reference's float64 accuracy
(reference is f64 end-to-end via BF_DOUBLE, meson.build:25).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
