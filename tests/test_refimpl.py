"""Tests of the numpy reference crypto core (the oracle itself).

Strategy mirrors the reference's differential plaintext-vs-encrypted oracle
(frontends/concrete-python/tests/conftest.py check_execution): every homomorphic
op is checked by decrypt(op_enc(encrypt(x))) == op_plain(x).
"""

import numpy as np
import pytest

from concrete_tpu.params import TEST_PARAMS_TINY, CryptoParams
from concrete_tpu.core import refimpl as ref

P = TEST_PARAMS_TINY


def test_encode_decode_roundtrip():
    for p in range(1, 9):
        msgs = np.arange(0, 1 << p)
        assert np.array_equal(ref.decode(ref.encode(msgs, p), p), msgs)
    # signed
    for p in range(1, 8):
        msgs = np.arange(-(1 << (p - 1)), 1 << (p - 1))
        dec = ref.decode(ref.encode(msgs, p), p, signed=True)
        assert np.array_equal(dec, msgs)


def test_decode_rounds_small_noise():
    p = 4
    enc = ref.encode(np.array([5]), p)
    noise = np.uint64(1) << np.uint64(64 - p - 4)  # well below half-step
    assert ref.decode(enc + noise, p) == 5
    assert ref.decode(enc - noise, p) == 5


def test_negacyclic_polymul_matches_bigint():
    rng = np.random.default_rng(0)
    n = 16
    a = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    got = ref.negacyclic_polymul(a, b)
    # big-int schoolbook
    exp = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            v = int(a[i]) * int(b[j])
            if k < n:
                exp[k] += v
            else:
                exp[k - n] -= v
    exp = np.array([e % (1 << 64) for e in exp], dtype=np.uint64)
    assert np.array_equal(got, exp)


def test_monomial_mul_rotation():
    n = 8
    p = np.arange(1, n + 1, dtype=np.uint64)
    # X^1 * p: p shifts up one slot, top coeff wraps negated
    q = ref.monomial_mul(p, 1)
    assert q[0] == np.uint64(0) - np.uint64(n)
    assert np.array_equal(q[1:], p[:-1])
    # X^N == -1
    q = ref.monomial_mul(p, n)
    assert np.array_equal(q, (-p.astype(np.int64)).astype(np.uint64))
    # X^{2N} == 1
    assert np.array_equal(ref.monomial_mul(p, 2 * n), p)
    # composition
    assert np.array_equal(ref.monomial_mul(ref.monomial_mul(p, 5), 7),
                          ref.monomial_mul(p, 12))


@pytest.mark.parametrize("base_log,levels", [(8, 2), (12, 2), (4, 5), (23, 1)])
def test_decompose_recompose(base_log, levels):
    rng = np.random.default_rng(1)
    v = rng.integers(0, 1 << 64, 1000, dtype=np.uint64)
    digits = ref.decompose(v, base_log, levels)
    half = 1 << (base_log - 1)
    assert digits.max() <= half and digits.min() >= -half
    rec = ref.recompose(digits, base_log)
    # recomposition equals v rounded to the representable grid
    err = (rec - v).astype(np.int64)
    bound = 1 << (64 - levels * base_log - 1)
    assert np.abs(err).max() <= bound


def test_lwe_roundtrip(rng):
    sk = ref.sample_binary_key(rng, (P.n_small,))
    msgs = np.arange(16)
    ct = ref.lwe_encrypt(rng, sk, ref.encode(msgs, 4), P.lwe_std)
    dec = ref.decode(ref.lwe_decrypt(sk, ct), 4)
    assert np.array_equal(dec, msgs)


def test_lwe_linear_ops(rng):
    sk = ref.sample_binary_key(rng, (P.n_small,))
    x, y = 3, 5
    cx = ref.lwe_encrypt(rng, sk, ref.encode(x, 4), P.lwe_std)
    cy = ref.lwe_encrypt(rng, sk, ref.encode(y, 4), P.lwe_std)
    # add
    assert ref.decode(ref.lwe_decrypt(sk, cx + cy), 4) == x + y
    # plaintext add
    assert ref.decode(ref.lwe_decrypt(sk, cx + ref.lwe_trivial(
        ref.encode(2, 4), P.n_small)), 4) == x + 2
    # cleartext mul
    assert ref.decode(ref.lwe_decrypt(sk, cx * np.uint64(2)), 4) == 2 * x
    # negation (signed)
    assert ref.decode(ref.lwe_decrypt(
        sk, (-cx.astype(np.int64)).astype(np.uint64)), 4, signed=True) == -x


def test_glwe_roundtrip(rng):
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    msg = ref.encode(np.arange(P.polynomial_size) % 16, 4)
    ct = ref.glwe_encrypt(rng, gsk, msg, P.glwe_std)
    dec = ref.decode(ref.glwe_decrypt(gsk, ct), 4)
    assert np.array_equal(dec, np.arange(P.polynomial_size) % 16)


def test_external_product(rng):
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    msg = ref.encode(np.arange(P.polynomial_size) % 8, 3)
    for bit in (0, 1):
        ct = ref.glwe_encrypt(rng, gsk, msg, P.glwe_std)
        ggsw = ref.ggsw_encrypt(rng, gsk, bit, P.pbs_base_log, P.pbs_level,
                                P.glwe_std)
        out = ref.external_product(ggsw, ct, P.pbs_base_log, P.pbs_level)
        dec = ref.decode(ref.glwe_decrypt(gsk, out), 3)
        expected = (np.arange(P.polynomial_size) % 8) * bit
        assert np.array_equal(dec, expected), f"bit={bit}"


def test_cmux(rng):
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    m0 = ref.encode(np.full(P.polynomial_size, 2), 3)
    m1 = ref.encode(np.full(P.polynomial_size, 5), 3)
    c0 = ref.glwe_encrypt(rng, gsk, m0, P.glwe_std)
    c1 = ref.glwe_encrypt(rng, gsk, m1, P.glwe_std)
    for bit, want in ((0, 2), (1, 5)):
        ggsw = ref.ggsw_encrypt(rng, gsk, bit, P.pbs_base_log, P.pbs_level,
                                P.glwe_std)
        out = ref.cmux(ggsw, c0, c1, P.pbs_base_log, P.pbs_level)
        dec = ref.decode(ref.glwe_decrypt(gsk, out), 3)
        assert np.all(dec == want)


def test_sample_extract(rng):
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    vals = np.arange(P.polynomial_size) % 16
    ct = ref.glwe_encrypt(rng, gsk, ref.encode(vals, 4), P.glwe_std)
    sk_big = gsk.reshape(-1)
    for idx in (0, 1, P.polynomial_size - 1, 7):
        lwe = ref.sample_extract(ct, idx)
        assert ref.decode(ref.lwe_decrypt(sk_big, lwe), 4) == vals[idx]


def test_keyswitch(rng):
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    sk_small = ref.sample_binary_key(rng, (P.n_small,))
    sk_big = gsk.reshape(-1)
    ksk = ref.keyswitch_keygen(rng, sk_big, sk_small, P.ks_base_log,
                               P.ks_level, P.lwe_std)
    msgs = np.arange(8)
    ct = ref.lwe_encrypt(rng, sk_big, ref.encode(msgs, 3), P.lwe_std / 16)
    out = ref.keyswitch(ct, ksk, P.ks_base_log, P.ks_level)
    dec = ref.decode(ref.lwe_decrypt(sk_small, out), 3)
    assert np.array_equal(dec, msgs)


def test_modulus_switch_rounding():
    logn = 6  # N=64 -> 7-bit output
    # exact multiples survive
    v = np.uint64(5) << np.uint64(64 - 7)
    assert ref.modulus_switch(v, logn) == 5
    # small noise rounds away
    assert ref.modulus_switch(v + np.uint64(1 << 40), logn) == 5
    assert ref.modulus_switch(v - np.uint64(1 << 40), logn) == 5


def test_encode_expand_lut_structure():
    p, n = 2, 16
    lut = np.array([1, 2, 3, 0], dtype=np.uint64)
    poly = ref.encode_expand_lut(lut, n, p)
    s = np.uint64(64 - p - 1)
    mega = n // 4
    # first half mega-case = lut[0]
    assert np.all(poly[:mega // 2] == lut[0] << s)
    # wrapped negated half at the end
    assert np.all(poly[-mega // 2:] == (-(lut[0] << s).astype(np.int64))
                  .astype(np.uint64))
    # middle cases
    assert np.all(poly[mega // 2: mega // 2 + mega] == lut[1] << s)


@pytest.mark.parametrize("signed", [False, True])
def test_pbs_end_to_end(rng, signed):
    """The flagship oracle test: encrypt -> PBS(lut) -> decrypt == lut[x]."""
    p = 3
    params = P
    sk, server = ref.keygen(rng, params)
    if signed:
        xs = list(range(-4, 4))
        lut = np.array([(abs(v) * 2) % 8 for v in range(8)], dtype=np.uint64)
        # lut is indexed by the *unsigned reinterpretation* for negatives:
        # table semantics follow the reference (table.py): index -1 -> lut[-1]
        def f(x):
            return int(lut[x]) if x >= 0 else int(lut[8 + x])
    else:
        xs = list(range(8))
        lut = np.array([(3 * v + 1) % 8 for v in range(8)], dtype=np.uint64)

        def f(x):
            return int(lut[x])
    for x in xs:
        ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(x, p),
                             params.lwe_std / 256)
        out = ref.pbs(ct, server, lut, params, p, signed=signed)
        dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, out), p)
        assert dec == f(x), f"x={x}: got {dec}, want {f(x)}"


def test_pbs_noise_is_fresh(rng):
    """PBS output noise should match the blind-rotate variance model."""
    from concrete_tpu.params import variance_blind_rotate
    params = P
    sk, server = ref.keygen(rng, params)
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    errs = []
    for x in range(8):
        ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(x, p),
                             params.lwe_std / 256)
        out = ref.pbs(ct, server, lut, params, p)
        phase = ref.lwe_decrypt(sk.lwe_big, out)
        err = (phase - ref.encode(x, p)).astype(np.int64) / 2.0 ** 64
        errs.append(err)
    measured_std = np.std(errs)
    model_var = variance_blind_rotate(
        params.n_small, params.glwe_dimension, params.polynomial_size,
        params.pbs_base_log, params.pbs_level, params.glwe_std ** 2)
    # loose sanity band (few samples): within 8x of model std
    assert measured_std < 8 * np.sqrt(model_var) + 1e-12
