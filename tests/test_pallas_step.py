"""Pallas step kernels vs the oracle, in interpreter mode on CPU."""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import kernels as K
from concrete_tpu.core import limbs as lb
from concrete_tpu.core import refimpl as ref
from concrete_tpu.ops import pallas_step as ps


def test_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 64, (16, 64), dtype=np.uint64))
    lo, hi = ps.split_u64(x)
    assert np.array_equal(np.asarray(ps.merge_u64(lo, hi)), np.asarray(x))


@pytest.mark.parametrize("base_log,levels", [(12, 2), (23, 1), (8, 2)])
def test_rotate_decompose_limbs_matches_oracle(base_log, levels):
    rng = np.random.default_rng(1)
    rows, n = 8, 128
    a_limbs = lb.num_digit_limbs(base_log)
    acc = rng.integers(0, 1 << 64, (rows, n), dtype=np.uint64)
    a_rows = rng.integers(0, 2 * n, rows).astype(np.int32)

    lo, hi = ps.split_u64(jnp.asarray(acc))
    planes = ps.rotate_decompose_limbs(
        lo, hi, jnp.asarray(a_rows), base_log=base_log, levels=levels,
        a_limbs=a_limbs, interpret=True)

    # oracle: rotate (negacyclic), subtract, decompose, limb split
    for i in range(rows):
        rot = ref.monomial_mul(acc[i], int(a_rows[i]))
        diff = rot - acc[i]
        digits = ref.decompose(diff, base_log, levels)       # (N, l)
        limbs = lb.i32_digits_to_balanced_i8(
            digits.astype(np.int32), a_limbs)                # (N, l, A)
        for lev in range(levels):
            for a in range(a_limbs):
                got = np.asarray(planes[lev * a_limbs + a][i])
                want = limbs[:, lev, a]
                assert np.array_equal(got, want), (i, lev, a)


@pytest.mark.parametrize("limb_offset", [0, 2])
def test_recombine_accumulate_matches_oracle(limb_offset):
    rng = np.random.default_rng(2)
    rows, n = 8, 128
    keep = 8 - limb_offset
    planes = rng.integers(-(1 << 30), 1 << 30,
                          (rows, keep, n)).astype(np.int32)
    acc = rng.integers(0, 1 << 64, (rows, n), dtype=np.uint64)

    lo, hi = ps.split_u64(jnp.asarray(acc))
    new_lo, new_hi = ps.recombine_accumulate(
        jnp.asarray(planes), lo, hi, limb_offset=limb_offset, interpret=True)
    got = np.asarray(ps.merge_u64(new_lo, new_hi))

    want = acc + np.asarray(lb.recombine_i32_planes_to_u64(
        planes, axis=1, limb_offset=limb_offset))
    assert np.array_equal(got, want)


def test_blind_rotate_pallas_matches_xla():
    """Full pallas-step blind rotate == XLA path (forced interpret on CPU)."""
    from jax.experimental.pallas import tpu as pltpu
    from concrete_tpu.params import TEST_PARAMS_TINY as P
    from concrete_tpu.core import keygen as kg

    rng = np.random.default_rng(11)
    sk, server = kg.keygen(rng, P)
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    msgs = np.arange(4)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p), P.lwe_std / 256)
    ct_small = jnp.asarray(ref.keyswitch(ct, server.ksk, P.ks_base_log,
                                         P.ks_level))
    bsk = K.pack_bsk(server.bsk, P)
    want = np.asarray(K._blind_rotate_xla(ct_small, bsk, lut_poly, P))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._blind_rotate_pallas(ct_small, bsk, lut_poly, P))
    assert np.array_equal(got, want)


def test_blind_rotate_pallas_truncated():
    from jax.experimental.pallas import tpu as pltpu
    from concrete_tpu.params import TEST_PARAMS_TINY as P
    from concrete_tpu.core import keygen as kg

    rng = np.random.default_rng(12)
    sk, server = kg.keygen(rng, P)
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    msgs = np.arange(4)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p), P.lwe_std / 256)
    ct_small = jnp.asarray(ref.keyswitch(ct, server.ksk, P.ks_base_log,
                                         P.ks_level))
    bsk = K.pack_bsk(server.bsk, P, truncate_limbs=2)
    want = np.asarray(K._blind_rotate_xla(ct_small, bsk, lut_poly, P))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._blind_rotate_pallas(ct_small, bsk, lut_poly, P))
    assert np.array_equal(got, want)


def test_blind_rotate_pallas_acc32_matches_xla():
    """Hi-only accumulator mode (truncate_limbs*8 >= 32, lo-free digits):
    bit-exact vs the XLA u64 path on the same truncated BSK — the low
    accumulator word is identically zero, so dropping it changes nothing
    (kernels._acc32_eligible)."""
    from jax.experimental.pallas import tpu as pltpu
    from concrete_tpu.params import TEST_PARAMS_TINY_WIDE as P
    from concrete_tpu.core import keygen as kg

    rng = np.random.default_rng(13)
    sk, server = kg.keygen(rng, P)
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    msgs = np.arange(4)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p), P.lwe_std / 256)
    ct_small = jnp.asarray(ref.keyswitch(ct, server.ksk, P.ks_base_log,
                                         P.ks_level))
    bsk = K.pack_bsk(server.bsk, P, truncate_limbs=4)
    assert K._acc32_eligible(bsk, P, 4)
    want = np.asarray(K._blind_rotate_xla(ct_small, bsk, lut_poly, P))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(K._blind_rotate_pallas_hi(ct_small, bsk,
                                                   lut_poly, P))
        via_dispatch = np.asarray(K._blind_rotate_pallas(ct_small, bsk,
                                                         lut_poly, P))
    assert np.array_equal(got, want)
    assert np.array_equal(via_dispatch, want)


@pytest.mark.parametrize("cin,cout,s_limbs,a_limbs,n", [
    (2, 2, 6, 1, 256), (3, 3, 6, 3, 256), (2, 1, 3, 2, 128)])
def test_banded_matmul_fused_matches_xla(cin, cout, s_limbs, a_limbs, n):
    from concrete_tpu.ops.pallas_banded_mm import banded_matmul_fused
    rng = np.random.default_rng(21)
    B = 8
    lhs_list = [jnp.asarray(rng.integers(-128, 128, (B, cin * n))
                            .astype(np.int8)) for _ in range(a_limbs)]
    vv = jnp.asarray(rng.integers(-128, 128, (cin, cout, s_limbs, 2 * n - 1))
                     .astype(np.int8))
    want = np.asarray(K.negacyclic_banded_matmul_planes(lhs_list, vv, 128))
    got = np.asarray(banded_matmul_fused(lhs_list, vv, 128, interpret=True,
                                         b_tile=8))
    assert np.array_equal(got, want)
