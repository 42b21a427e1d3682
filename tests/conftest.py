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

import zlib

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True)
def _seed_global_rng(request):
    """Seed the global numpy RNG per test, derived from the test id.

    Many tests build inputsets with np.random.*; without this, the inputset
    a test sees depends on which tests ran before it (round-3 ordering
    failure: test_multi_precision_mixed_width_tlus measured 4-bit output
    bounds from an unlucky inputset and lost the top bit).  Seeding per-test
    makes every test deterministic regardless of suite order.
    """
    np.random.seed(zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF)
