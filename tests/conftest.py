"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding paths are exercised
without TPU hardware (the driver separately dry-runs multichip compilation).
Set CONCRETE_TPU_TEST_PLATFORM=tpu to run against a real chip.

Note: this environment's sitecustomize registers the remote `axon` TPU
backend and forces jax_platforms='axon,cpu' at import time; overriding the
env var is not enough — we must override the jax config after import.
"""

import os

_platform = os.environ.get("CONCRETE_TPU_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
