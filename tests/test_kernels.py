"""JAX kernels vs the numpy oracle: bit-exact equivalence tests (CPU)."""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import kernels as K
from concrete_tpu.core import limbs as lb
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY

P = TEST_PARAMS_TINY


@pytest.fixture(scope="module")
def keys():
    rng = np.random.default_rng(123)
    sk, server = ref.keygen(rng, P)
    return rng, sk, server


def test_decompose_matches_oracle():
    rng = np.random.default_rng(5)
    v = rng.integers(0, 1 << 64, (64, 7), dtype=np.uint64)
    for b, l in [(8, 2), (12, 2), (23, 1), (4, 5)]:
        got = np.asarray(K.decompose(jnp.asarray(v), b, l))
        want = ref.decompose(v, b, l)
        assert np.array_equal(got, want.astype(np.int32)), (b, l)


def test_modulus_switch_matches_oracle():
    rng = np.random.default_rng(6)
    v = rng.integers(0, 1 << 64, 1000, dtype=np.uint64)
    got = np.asarray(K.modulus_switch(jnp.asarray(v), 6))
    want = ref.modulus_switch(v, 6)
    assert np.array_equal(got.astype(np.uint64), want)


def test_monomial_mul_matches_oracle():
    rng = np.random.default_rng(7)
    n = 64
    polys = rng.integers(0, 1 << 64, (5, n), dtype=np.uint64)
    rots = np.array([0, 1, n - 1, n, 2 * n - 1], dtype=np.int32)
    got = np.asarray(K.monomial_mul_batch(jnp.asarray(polys), jnp.asarray(rots)))
    for i in range(5):
        want = ref.monomial_mul(polys[i], int(rots[i]))
        assert np.array_equal(got[i], want), i


def test_negacyclic_limb_conv_exact():
    """Limb-plane convolution + recombination == schoolbook polymul mod 2^64."""
    rng = np.random.default_rng(8)
    n = 64
    cin, cout, batch = 3, 2, 4
    base_log = 12
    half = 1 << (base_log - 1)
    digits = rng.integers(-half + 1, half + 1, (batch, cin, n)).astype(np.int32)
    w = rng.integers(0, 1 << 64, (cout, cin, n), dtype=np.uint64)

    a_limbs = lb.num_digit_limbs(base_log)
    d_limbs = lb.i32_digits_to_balanced_i8(digits, a_limbs)   # (B, Cin, N, A)
    d_limbs = np.moveaxis(d_limbs, -1, -2)                    # (B, Cin, A, N)
    w_limbs = np.moveaxis(lb.u64_to_balanced_i8(w), -1, -2)   # (Cout, Cin, 8, N)
    w_flip = K._flip_kernel_limbs(w_limbs)

    planes = K.negacyclic_limb_conv(jnp.asarray(d_limbs), jnp.asarray(w_flip))
    got = np.asarray(lb.recombine_i32_planes_to_u64(planes, axis=-2))

    for b in range(batch):
        for c in range(cout):
            want = np.zeros(n, dtype=np.uint64)
            for i in range(cin):
                want += ref.negacyclic_polymul(
                    digits[b, i].astype(np.uint64), w[c, i])
            assert np.array_equal(got[b, c], want), (b, c)


def test_negacyclic_banded_matmul_exact():
    """Banded Toeplitz matmul path == schoolbook polymul mod 2^64."""
    rng = np.random.default_rng(9)
    n = 256  # exercises multi-block (nb=2) with block=128
    cin, cout, batch = 2, 2, 3
    base_log = 17
    half = 1 << (base_log - 1)
    digits = rng.integers(-half + 1, half + 1, (batch, cin, n)).astype(np.int32)
    w = rng.integers(0, 1 << 64, (cin, cout, n), dtype=np.uint64)

    a_limbs = lb.num_digit_limbs(base_log)
    d_limbs = lb.i32_digits_to_balanced_i8(digits, a_limbs)     # (B,Cin,N,A)
    ext = np.concatenate([np.uint64(0) - w[..., 1:], w], axis=-1)
    vv = np.moveaxis(lb.u64_to_balanced_i8(ext), -1, -2)        # (Cin,Cout,8,2N-1)

    planes = K.negacyclic_banded_matmul(jnp.asarray(d_limbs),
                                        jnp.asarray(vv), 128)
    got = np.asarray(lb.recombine_i32_planes_to_u64(
        planes[:, :, :8, :], axis=-2))

    for b in range(batch):
        for c in range(cout):
            want = np.zeros(n, dtype=np.uint64)
            for i in range(cin):
                want += ref.negacyclic_polymul(
                    digits[b, i].astype(np.uint64), w[i, c])
            assert np.array_equal(got[b, c], want), (b, c)


def test_keyswitch_matches_oracle(keys):
    rng, sk, server = keys
    msgs = np.arange(8)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, 3), P.lwe_std / 16)
    want = ref.keyswitch(ct, server.ksk, P.ks_base_log, P.ks_level)
    ksk = K.pack_ksk(server.ksk, P)
    got = np.asarray(K.keyswitch(jnp.asarray(ct), ksk))
    assert np.array_equal(got, want)


def test_blind_rotate_and_pbs_match_oracle(keys):
    rng, sk, server = keys
    p = 3
    lut = np.array([(3 * v + 1) % 8 for v in range(8)], dtype=np.uint64)
    msgs = np.arange(8)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p), P.lwe_std / 256)

    want = np.stack([ref.pbs(ct[i], server, lut, P, p) for i in range(8)])

    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, p)
    got = np.asarray(K.pbs_batch(jnp.asarray(ct), ksk, bsk,
                                 jnp.asarray(lut_poly), P, p))
    assert np.array_equal(got, want)
    # and the decrypted outputs are correct
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, got), p)
    assert np.array_equal(dec, (3 * msgs + 1) % 8)


def test_truncated_bsk_pbs_correct(keys):
    """With truncated BSK limbs results are no longer bit-exact vs the
    oracle, but decrypted outputs stay correct and the added noise matches
    the model bound."""
    rng, sk, server = keys
    from concrete_tpu.params import variance_bsk_limb_truncation
    p = 3
    lut = np.array([(3 * v + 1) % 8 for v in range(8)], dtype=np.uint64)
    msgs = np.arange(8)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p), P.lwe_std / 256)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P, truncate_limbs=2)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, p)
    got = np.asarray(K.pbs_batch(jnp.asarray(ct), ksk, bsk,
                                 jnp.asarray(lut_poly), P, p))
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, got), p)
    assert np.array_equal(dec, (3 * msgs + 1) % 8)
    var = variance_bsk_limb_truncation(
        P.n_small, P.glwe_dimension, P.polynomial_size, P.pbs_base_log,
        P.pbs_level, 2)
    # truncation noise stays far below a quarter encoding step
    assert np.sqrt(var) < 2.0 ** -(p + 4)


def test_pbs_signed_matches_oracle(keys):
    rng, sk, server = keys
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    xs = np.arange(-4, 4)
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(xs, p), P.lwe_std / 256)
    want = np.stack([ref.pbs(ct[i], server, lut, P, p, signed=True)
                     for i in range(len(xs))])
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, p, signed=True)
    got = np.asarray(K.pbs_batch(jnp.asarray(ct), ksk, bsk,
                                 jnp.asarray(lut_poly), P, p, signed=True))
    assert np.array_equal(got, want)


def test_latency_blind_rotate_matches_throughput_path(keys):
    """The small-batch (latency-mode) blind rotate is bit-identical to the
    throughput path at full BSK precision, for every batch size it serves."""
    rng, sk, server = keys
    p = 3
    lut = np.array([(3 * v + 1) % 8 for v in range(8)], dtype=np.uint64)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    for b in (1, 2, 4):
        msgs = np.arange(b) % 8
        ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p),
                             P.lwe_std / 256)
        ct_s = K.keyswitch(jnp.asarray(ct), ksk)
        got = np.asarray(K._blind_rotate_xla_latency(ct_s, bsk, lut_poly, P))
        want = np.asarray(K._blind_rotate_xla(ct_s, bsk, lut_poly, P))
        assert np.array_equal(got, want), b


def test_latency_blind_rotate_truncated_bsk_correct(keys):
    """Under BSK limb truncation the latency path is statistically (not
    bit-) identical: wrap terms apply -digits x trunc(w) instead of
    digits x trunc(-w); the dropped-limb error distribution is the same.
    Decrypted outputs must stay correct."""
    rng, sk, server = keys
    p = 3
    lut = np.array([(3 * v + 1) % 8 for v in range(8)], dtype=np.uint64)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P, truncate_limbs=2)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p))
    msgs = np.arange(4) % 8
    ct = ref.lwe_encrypt(rng, sk.lwe_big, ref.encode(msgs, p),
                         P.lwe_std / 256)
    ct_s = K.keyswitch(jnp.asarray(ct), ksk)
    acc = K._blind_rotate_xla_latency(ct_s, bsk, lut_poly, P)
    out = np.asarray(K.sample_extract(acc, 0))
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, out), p)
    assert np.array_equal(dec, (3 * msgs + 1) % 8)


def test_decompose_hi32_matches_u64():
    """decompose_hi32 (the keyswitch hot path's lo-free decompose) is
    EXACT vs the u64 closed form whenever levels*base_log <= 31,
    including the all-ones rounding-carry edge values."""
    import jax.numpy as jnp
    from concrete_tpu.core import kernels as K
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 64, (4096,), dtype=np.uint64)
    special = np.array(
        [0, 2**64 - 1, 2**63, 2**63 - 1, 2**48 - 1, (2**32 - 1) << 32,
         ((1 << 31) - 1) << 33, (0xFFFFFFFF << 32) | 0xFFFFFFFF],
        dtype=np.uint64)
    v = np.concatenate([v, special])
    for bl, lv in [(2, 8), (4, 4), (5, 4), (4, 3), (23, 1), (15, 2)]:
        a = K.decompose(jnp.asarray(v), bl, lv)
        b = K.decompose_hi32(jnp.asarray(v), bl, lv)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (bl, lv)
