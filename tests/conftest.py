"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Tests validate numerics and sharding semantics on the CPU backend (bit-exact
integer arithmetic is platform-independent); the real-TPU path is exercised
by bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xBEEF)
