"""Bit-exactness tests for the single-kernel fused CRT-NTT blind rotation
(ops/pallas_fused_ntt.py) against the numpy oracle (core/refimpl.py) on the
truncated BSK — interpret mode on CPU.
"""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.core import refimpl as ref
from concrete_tpu.ops import pallas_fused_ntt as fn
from concrete_tpu.params import BENCH_PARAMS_6BIT, CryptoParams

# smallest shape the fused kernel supports (n1 = N/128 >= 8)
P_TEST = CryptoParams(
    n_small=6, glwe_dimension=1, polynomial_size=1024,
    pbs_level=2, pbs_base_log=8, ks_level=2, ks_base_log=8,
    lwe_std=2.0 ** -25, glwe_std=2.0 ** -35, security_level=0)


def test_choose_fused_primes_6bit_is_three_primes():
    primes, t = fn.choose_fused_primes(BENCH_PARAMS_6BIT, message_bits=6)
    assert len(primes) == 3
    assert t >= 1
    # exact range actually covers the truncated product
    import math
    cap = math.prod(primes).bit_length() - 1
    assert fn.required_bits(BENCH_PARAMS_6BIT, t) <= cap


def _random_inputs(rng, params, b_ct):
    bsk = rng.integers(0, 1 << 64, (params.n_small, params.pbs_level,
                                    params.glwe_dimension + 1,
                                    params.glwe_dimension + 1,
                                    params.polynomial_size),
                       dtype=np.uint64)
    ct = rng.integers(0, 1 << 64, (b_ct, params.n_small + 1),
                      dtype=np.uint64)
    lut = rng.integers(0, 1 << 64, params.polynomial_size, dtype=np.uint64)
    return bsk, ct, lut


@pytest.mark.parametrize("poly_size", [2048, 8192, 16384])
def test_blind_rotate_fused_bit_exact_other_sizes(rng, poly_size):
    """The optimizer now offers the fused path every size in
    [1024, FUSED_NTT_MAX_POLY_SIZE] — cover the sizes the 6-bit test
    doesn't (N=2048 via MULTI partitions, N=8192 via 7-bit mono,
    N=16384 = the largest size the optimizer's table covers)."""
    params = CryptoParams(
        n_small=2, glwe_dimension=1, polynomial_size=poly_size,
        pbs_level=1, pbs_base_log=18, ks_level=2, ks_base_log=8,
        lwe_std=2.0 ** -25, glwe_std=2.0 ** -45, security_level=0)
    b_ct = 2
    bsk, ct, lut = _random_inputs(rng, params, b_ct)
    primes, t = fn.choose_fused_primes(params, message_bits=6)
    fbsk = fn.pack_bsk_fused(bsk, params, primes=primes, trunc_bits=t)
    got = np.asarray(fn.blind_rotate_fused(
        jnp.asarray(ct), fbsk, jnp.asarray(lut), params, interpret=True,
        acc32=False))
    bsk_oracle = fn.truncate_bsk_u64(bsk, t)
    for b in range(b_ct):
        want = ref.blind_rotate(ct[b], bsk_oracle, lut, params)
        assert np.array_equal(got[b], want), f"row {b} differs (N={poly_size})"


@pytest.mark.parametrize("n_primes,expect_trunc", [(3, False), (2, True)])
def test_blind_rotate_fused_bit_exact(rng, n_primes, expect_trunc):
    params = P_TEST
    b_ct = 4
    bsk, ct, lut = _random_inputs(rng, params, b_ct)
    pool = nt.ntt_primes_near_pow2(params.polynomial_size, 128)
    primes = pool[:n_primes]
    import math
    cap = math.prod(primes).bit_length() - 1
    t = max(0, fn.required_bits(params, 0) - cap)
    assert (t > 0) == expect_trunc
    fbsk = fn.pack_bsk_fused(bsk, params, primes=primes, trunc_bits=t)
    got = np.asarray(fn.blind_rotate_fused(
        jnp.asarray(ct), fbsk, jnp.asarray(lut), params, interpret=True,
        acc32=False))
    bsk_oracle = fn.truncate_bsk_u64(bsk, t)
    for b in range(b_ct):
        want = ref.blind_rotate(ct[b], bsk_oracle, lut, params)
        assert np.array_equal(got[b], want), f"row {b} differs (t={t})"


def test_fused_tables_safe_across_separate_jits(rng):
    """Regression (round 4 red): build_fused_tables' lru_cache first fires
    INSIDE a jit trace; the cached arrays must be concrete, or every later
    trace with the same (n, primes, dl, group) key dies with
    UnexpectedTracerError (exactly how test_norm2_cut_end_to_end and the
    MULTI bench row crashed)."""
    fn.build_fused_tables.cache_clear()
    params = P_TEST
    b_ct = 2
    bsk, ct, lut = _random_inputs(rng, params, b_ct)
    primes, t = fn.choose_fused_primes(params, message_bits=3)
    fbsk = fn.pack_bsk_fused(bsk, params, primes=primes, trunc_bits=t)

    import jax

    def run(c):
        return fn.blind_rotate_fused(c, fbsk, jnp.asarray(lut), params,
                                     interpret=True, acc32=False)

    # two SEPARATE jit objects = two traces sharing one table-cache entry
    got1 = np.asarray(jax.jit(run)(jnp.asarray(ct)))
    got2 = np.asarray(jax.jit(run)(jnp.asarray(ct)))
    bsk_oracle = fn.truncate_bsk_u64(bsk, t)
    want = np.stack([ref.blind_rotate(ct[b], bsk_oracle, lut, params)
                     for b in range(b_ct)])
    assert np.array_equal(got1, want)
    assert np.array_equal(got2, want)


def test_blind_rotate_fused_acc32_bit_exact(rng):
    """Hi-only accumulator mode vs its truncated-arithmetic numpy oracle
    (blind_rotate_acc32_oracle): the kernel's per-step top-word updates,
    the H prefold, and the lo-free digits must reproduce exactly."""
    params = P_TEST
    b_ct = 3
    bsk, ct, lut = _random_inputs(rng, params, b_ct)
    primes, t = fn.choose_fused_primes(params, message_bits=3)
    fbsk = fn.pack_bsk_fused(bsk, params, primes=primes, trunc_bits=t)
    assert fn.acc32_eligible(fbsk)
    got = np.asarray(fn.blind_rotate_fused(
        jnp.asarray(ct), fbsk, jnp.asarray(lut), params, interpret=True))
    for b in range(b_ct):
        want = fn.blind_rotate_acc32_oracle(ct[b], bsk, lut, params,
                                            primes, t)
        assert np.array_equal(got[b], want), f"row {b} differs"


def test_pbs_batch_dispatches_fused(rng):
    """Full PBS through the FusedBSK path decrypts to the right LUT values."""
    params = P_TEST
    p_bits = 3
    sk, server = kg.keygen(rng, params)
    ksk = kn.pack_ksk(server.ksk, params)
    fbsk = fn.pack_bsk_fused(server.bsk, params, message_bits=p_bits)
    lut = np.array([(5 * v + 2) % (1 << p_bits) for v in range(1 << p_bits)],
                   dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut, params.polynomial_size, p_bits))
    msgs = rng.integers(0, 1 << p_bits, 4)
    ct = jnp.asarray(kg.encrypt_lwe_batch(
        rng, sk.lwe_big, ref.encode(msgs, p_bits), params.lwe_std / 4))
    out = kn.pbs_batch(ct, ksk, fbsk, lut_poly, params, p_bits)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, np.asarray(out)), p_bits)
    want = (5 * msgs + 2) % (1 << p_bits)
    assert np.array_equal(dec, want)


def test_truncation_noise_budget_6bit():
    """The 3-prime truncation's added variance is negligible next to the
    intrinsic blind-rotate variance of the 6-bit parameters."""
    from concrete_tpu import params as pp
    params = BENCH_PARAMS_6BIT
    _, t = fn.choose_fused_primes(params, message_bits=6)
    added = pp.variance_bsk_truncation_bits(
        params.n_small, params.glwe_dimension, params.polynomial_size,
        params.pbs_base_log, params.pbs_level, t, params.q_log)
    intrinsic = pp.variance_blind_rotate(
        params.n_small, params.glwe_dimension, params.polynomial_size,
        params.pbs_base_log, params.pbs_level, params.glwe_std ** 2,
        params.q_log)
    assert added < 0.05 * intrinsic


def test_garner_prefolded_exact_lazy_and_boundary():
    """_garner_prefolded == (z << t) mod 2^64 for c'_i = z*M_i^{-1} mod p_i
    given as LAZY representatives (canonical, +p_i, and near-2^32 where
    admissible), incl. |z| -> P/4 edge values."""
    import jax
    from concrete_tpu.core import ntt_tpu as nt2

    primes = tuple(nt2.ntt_primes_near_pow2(4096, 128)[:3])
    p_prod = int(np.prod([int(p) for p in primes], dtype=object))
    rng = np.random.default_rng(7)
    z = rng.integers(-(1 << 62), 1 << 62, (8, 256)).astype(object)
    edge = [(p_prod >> 2) - 1, -(p_prod >> 2), (p_prod >> 2) - 999,
            -((p_prod >> 2) - 3), 1, -1, 0]
    z[0, :len(edge)] = edge
    cs = []
    lazy_bump = rng.integers(0, 2, (3, 8, 256))
    for i, p in enumerate(primes):
        m_i = p_prod // p
        minv = pow(m_i % p, -1, p)
        c = (np.vectorize(int)(z) * minv) % p
        # lazy representative: + p where it still fits u32
        c = c + lazy_bump[i] * p * (c + p < (1 << 32))
        cs.append(jnp.asarray(c.astype(np.int64).astype(np.uint32)))
    for shift in (0, 9, 40):
        hi, lo = jax.jit(
            lambda r, s=shift: fn._garner_prefolded(primes, r, s))(cs)
        want = np.vectorize(
            lambda v, s=shift: (int(v) << s) % (1 << 64),
            otypes=[object])(z)
        np.testing.assert_array_equal(
            np.asarray(lo), (want % (1 << 32)).astype(np.int64)
            .astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(hi), (want >> 32).astype(np.int64)
            .astype(np.uint32))


def test_garner_shifted_exact_incl_boundary():
    """_garner_shifted == (z << t) mod 2^64 for random AND adversarial
    |z| -> P/4 values (the exact-k estimate's worst case; accepted
    configurations stay under P/4 via required_bits' +2 guard)."""
    import jax
    from concrete_tpu.core import ntt_tpu as nt2

    primes = tuple(nt2.ntt_primes_near_pow2(4096, 128)[:3])
    p_prod = int(np.prod([int(p) for p in primes], dtype=object))
    rng = np.random.default_rng(3)
    z = rng.integers(-(1 << 62), 1 << 62, (8, 256)).astype(object)
    edge = [(p_prod >> 2) - 1, -(p_prod >> 2), (p_prod >> 2) - 12345,
            -((p_prod >> 2) - 7), 1, -1, 0, (p_prod >> 3) * 2 - 3]
    z[0, :len(edge)] = edge
    res = [jnp.asarray((np.vectorize(int)(z) % p).astype(np.uint32))
           for p in primes]
    for shift in (0, 9, 32, 40):
        hi, lo = jax.jit(
            lambda r, s=shift: fn._garner_shifted(primes, r, s))(res)
        want = np.vectorize(
            lambda v, s=shift: (int(v) << s) % (1 << 64),
            otypes=[object])(z)
        np.testing.assert_array_equal(
            np.asarray(lo), (want % (1 << 32)).astype(np.int64)
            .astype(np.uint32))
        np.testing.assert_array_equal(
            np.asarray(hi), (want >> 32).astype(np.int64)
            .astype(np.uint32))
