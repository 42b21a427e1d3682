"""CRT-NTT external product tests: exactness vs the banded path + oracle.

The NTT path (core/ntt_tpu.py) must be bit-identical to the banded-matmul
path at every level: transforms, external product, blind rotate, full PBS.
"""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as K
from concrete_tpu.core import ntt as ntt_host
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY as P


def test_primes_near_pow2():
    shift_set = {p for p, _k in nt.SHIFT_PRIMES}
    primes = nt.ntt_primes_near_pow2(64, 100)
    assert len(set(primes)) == len(primes)
    for p in primes:
        assert p % 128 == 1 and p < (1 << 31)
        # fold contraction guarantee: generic primes have small hi31, the
        # shift primes have hi31 = 2^k - 1 (handled adaptively by _fold)
        assert p in shift_set or (1 << 31) % p < (1 << 22)
        assert ntt_host.is_prime(p)


def test_shift_primes():
    """The fixed Pallas-friendly prime set: p = 2^31 - (2^k - 1), prime,
    with two-adicity covering N up to 2^16."""
    for p, k in nt.SHIFT_PRIMES:
        assert p == (1 << 31) - ((1 << k) - 1)
        assert ntt_host.is_prime(p)
        assert (p - 1) % (1 << 17) == 0
        assert (1 << 31) % p == (1 << k) - 1


def test_fwd_inv_roundtrip_and_oracle(rng):
    n = 64
    for p in nt.ntt_primes_near_pow2(n, 70):
        plan = nt.build_plan(n, p)
        x = rng.integers(0, p, (3, n), dtype=np.uint64)
        xf = nt.ntt_fwd(jnp.asarray(x), plan)
        assert np.array_equal(np.asarray(nt.ntt_inv(xf, plan)), x)
        nat = ntt_host.ntt_forward(x.astype(np.int64) % p, n, p)
        perm = nt._fwd_perm(n, plan.n1)
        assert np.array_equal(np.asarray(xf),
                              nat[..., perm].astype(np.uint64))


def test_external_product_matches_banded(rng):
    """The CRT-NTT external product equals the banded-matmul external
    product bit-for-bit (both compute sum_cin digits (*) bsk mod 2^64)."""
    n = P.polynomial_size
    l, kp1 = P.pbs_level, P.glwe_dimension + 1
    cin = l * kp1
    bsk = rng.integers(0, 1 << 63, (4, l, kp1, kp1, n), dtype=np.uint64)
    packed = nt.pack_bsk_ntt(bsk, P)
    digits = rng.integers(-(1 << (P.pbs_base_log - 1)),
                          1 << (P.pbs_base_log - 1),
                          (3, cin, n)).astype(np.int32)
    got = np.asarray(nt.external_product_ntt(
        jnp.asarray(digits), packed.spectra[:, 2], packed.primes, P))

    # oracle: the exact negacyclic contraction in numpy
    want = np.zeros((3, kp1, n), dtype=np.uint64)
    flat = bsk.reshape(4, cin, kp1, n)
    for b in range(3):
        for c in range(cin):
            for co in range(kp1):
                want[b, co] += ref.negacyclic_polymul(
                    digits[b, c].astype(np.int64).astype(np.uint64),
                    flat[2, c, co])
    assert np.array_equal(got, want)


def test_blind_rotate_ntt_matches_banded(rng):
    sk, server = kg.keygen(rng, P)
    bits = 3
    lut = np.array([(v * 3 + 1) % 8 for v in range(8)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size,
                                                 bits))
    msgs = rng.integers(0, 8, 6)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_small.astype(np.uint64),
                              ref.encode(msgs, bits), P.lwe_std / 256)
    bsk_banded = K.pack_bsk(server.bsk, P)
    bsk_ntt = nt.pack_bsk_ntt(server.bsk, P)
    acc_banded = np.asarray(K.blind_rotate(jnp.asarray(ct), bsk_banded,
                                           lut_poly, P, use_pallas=False))
    acc_ntt = np.asarray(nt.blind_rotate_ntt(jnp.asarray(ct), bsk_ntt,
                                             lut_poly, P))
    assert np.array_equal(acc_ntt, acc_banded)


def test_pbs_small_ntt_matches_refimpl(rng):
    """KS + NTT blind rotate + extract equals the refimpl PBS end-to-end.

    (The NttBSK dispatch was retired from kernels.pbs_batch in round 4 —
    VERDICT r3 #10; blind_rotate_ntt survives only as the math behind the
    limb-sharded multi-chip layout, parallel/limb_sharding.py, so it is
    validated here directly.)"""
    sk, server = kg.keygen(rng, P)
    bits = 3
    lut = np.array([(v + 2) % 8 for v in range(8)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size,
                                                 bits))
    msgs = rng.integers(0, 8, 8)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(msgs, bits),
                              P.lwe_std / 256)
    ksk = K.pack_ksk(server.ksk, P)
    small = K.keyswitch(jnp.asarray(ct), ksk)
    acc = nt.blind_rotate_ntt(small, nt.pack_bsk_ntt(server.bsk, P),
                              lut_poly, P)
    got = np.asarray(K.sample_extract(acc, 0))
    want_acc = K.blind_rotate(small, K.pack_bsk(server.bsk, P), lut_poly,
                              P, use_pallas=False)
    want = np.asarray(K.sample_extract(want_acc, 0))
    assert np.array_equal(got, want)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, got), bits)
    assert np.array_equal(dec, (msgs + 2) % 8)


def test_keys_evaluation_default_is_banded():
    """Default policy below the fused switchover: banded limb planes (the
    retired per-stage NTT variants are no longer selectable)."""
    from concrete_tpu.compilation.keys import Keys
    keys = Keys(P)
    keys.generate(seed=3)
    _, bsk = keys.evaluation_for(3)
    assert isinstance(bsk, K.LimbBSK)


def test_garner_centering(rng):
    """Negative coefficients recombine correctly (the centering compare)."""
    primes = nt.ntt_primes_near_pow2(64, 70)
    plans = [nt.build_plan(64, p) for p in primes]
    vals = np.array([-1, -(1 << 40), (1 << 40), 0, 7,
                     -(1 << 62)], dtype=np.int64)
    residues = [jnp.asarray((vals.astype(object) % p).astype(np.uint64))
                for p in primes]
    got = np.asarray(nt.garner_to_u64(residues, primes, plans))
    assert np.array_equal(got, vals.astype(np.uint64))
