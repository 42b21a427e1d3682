"""Tests of the balanced limb decompositions (core/limbs.py)."""

import numpy as np

from concrete_tpu.core import limbs as lb


def test_u64_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 64, 4096, dtype=np.uint64)
    planes = lb.u64_to_balanced_i8(x)
    assert planes.dtype == np.int8
    rec = lb.recombine_i32_planes_to_u64(planes.astype(np.int32))
    assert np.array_equal(rec, x)


def test_u64_edge_values():
    x = np.array([0, 1, (1 << 64) - 1, 1 << 63, 0x8080808080808080,
                  0x7F7F7F7F7F7F7F7F, 0xFFFFFFFF00000000], dtype=np.uint64)
    planes = lb.u64_to_balanced_i8(x)
    rec = lb.recombine_i32_planes_to_u64(planes.astype(np.int32))
    assert np.array_equal(rec, x)


def test_i32_digit_limbs_exact():
    rng = np.random.default_rng(4)
    for base_log in (3, 8, 15, 23):
        a = lb.num_digit_limbs(base_log)
        half = 1 << (base_log - 1)
        d = rng.integers(-half + 1, half + 1, 10000).astype(np.int32)
        planes = lb.i32_digits_to_balanced_i8(d, a)
        rec = np.zeros_like(d, dtype=np.int64)
        for j in range(a):
            rec += planes[..., j].astype(np.int64) << (8 * j)
        assert np.array_equal(rec, d.astype(np.int64)), base_log
        assert planes.max() <= 127 and planes.min() >= -128


def test_recombine_mod_2_64():
    # planes beyond index 7 must not contribute
    planes = np.zeros((2, 10), dtype=np.int32)
    planes[0, 8] = 123
    planes[1, 3] = -1
    rec = lb.recombine_i32_planes_to_u64(planes)
    assert rec[0] == 0
    assert rec[1] == np.uint64(0) - np.uint64(1 << 24)
