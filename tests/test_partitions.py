"""Multi-partition mechanism: cross-partition TLUs via conversion keyswitch.

The executable core of the reference's DAG_MULTI strategy (partition
frontiers as KS into the target partition's bootstrap)."""

import numpy as np
import pytest

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import partitions as pt
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY, TEST_PARAMS_TINY_WIDE


@pytest.fixture(scope="module")
def keyset():
    rng = np.random.default_rng(77)
    ks = pt.keygen_partitioned(
        rng,
        specs={"small": (TEST_PARAMS_TINY, 3),
               "big": (TEST_PARAMS_TINY_WIDE, 6)},
        conversions=[("small", "big"), ("big", "small")])
    return rng, ks


def test_cross_partition_square(keyset):
    """3-bit values in partition 'small' -> v^2 (6 bits) in partition 'big'."""
    rng, ks = keyset
    a = ks.partition("small")
    b = ks.partition("big")
    xs = np.arange(8)
    ct = kg.encrypt_lwe_batch(rng, a.secret.lwe_big,
                              ref.encode(xs, a.message_bits),
                              a.params.lwe_std / 64)
    table = np.array([v * v for v in range(8)])
    for _ in range(3):
        out = pt.cross_partition_pbs(ks, "small", "big", ct, table,
                                     in_bits=3, out_bits=6)
        dec = ref.decode(ref.lwe_decrypt(b.secret.lwe_big, out), 6)
        if np.array_equal(dec, xs * xs):
            return
    raise AssertionError(dec)


def test_round_trip_partitions(keyset):
    """small -> big -> small keeps values intact (mod 8 on the way back)."""
    rng, ks = keyset
    a = ks.partition("small")
    xs = np.arange(8)
    ct = kg.encrypt_lwe_batch(rng, a.secret.lwe_big,
                              ref.encode(xs, a.message_bits),
                              a.params.lwe_std / 64)
    # up: 3-bit input, 3-bit-valued output ((5v)%8) under the big partition;
    # down: the 3-bit value crosses back into the small partition (its N can
    # resolve a 3-bit TLU input) — precision rides the value, not the keys.
    up_table = np.array([(5 * v) % 8 for v in range(8)])
    down_table = np.array([(v + 1) % 8 for v in range(8)])
    for _ in range(4):
        up = pt.cross_partition_pbs(ks, "small", "big", ct, up_table,
                                    in_bits=3, out_bits=3)
        down = pt.cross_partition_pbs(ks, "big", "small", up, down_table,
                                      in_bits=3, out_bits=3)
        dec = ref.decode(ref.lwe_decrypt(a.secret.lwe_big, down), 3)
        if np.array_equal(dec, ((5 * xs) % 8 + 1) % 8):
            return
    raise AssertionError(dec)

def test_partition_precision_guard(keyset):
    rng, ks = keyset
    a = ks.partition("small")
    ct = kg.encrypt_lwe_batch(rng, a.secret.lwe_big, ref.encode(0, 3),
                              a.params.lwe_std / 64)
    with pytest.raises(ValueError, match="cannot"):
        pt.cross_partition_pbs(ks, "big", "small", ct[None],
                               np.arange(64), in_bits=6, out_bits=3)
