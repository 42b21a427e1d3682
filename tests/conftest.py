"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
without TPU hardware (the driver separately dry-runs multichip compilation).
Set CONCRETE_TPU_TEST_PLATFORM=tpu to run against a real chip.
"""

import os

if os.environ.get("CONCRETE_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
