"""Fast keygen produces functionally correct keys (tiny + real-ish params)."""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as K
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY

P = TEST_PARAMS_TINY


def test_fast_keygen_pbs_roundtrip(rng):
    sk, server = kg.keygen(rng, P)
    p = 3
    lut = np.array([(v * v) % 8 for v in range(8)], dtype=np.uint64)
    msgs = np.arange(8)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(msgs, p),
                              P.lwe_std / 256)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, p)
    out = np.asarray(K.pbs_batch(jnp.asarray(ct), ksk, bsk,
                                 jnp.asarray(lut_poly), P, p))
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, out), p)
    assert np.array_equal(dec, (msgs * msgs) % 8)


def test_fast_keygen_matches_oracle_glwe_encrypt(rng):
    """The limb-conv mask product equals the schoolbook key dot product."""
    gsk = ref.sample_binary_key(rng, (P.glwe_dimension, P.polynomial_size))
    m = ref.encode(np.arange(P.polynomial_size) % 8, 3)
    cts = kg.glwe_encrypt_batch(rng, gsk, np.stack([m, m]), P.glwe_std)
    for ct in cts:
        dec = ref.decode(ref.glwe_decrypt(gsk, ct), 3)
        assert np.array_equal(dec, np.arange(P.polynomial_size) % 8)


def test_fast_ksk_works(rng):
    sk, server = kg.keygen(rng, P)
    msgs = np.arange(8)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(msgs, 3),
                              P.lwe_std / 16)
    out = ref.keyswitch(ct, server.ksk, P.ks_base_log, P.ks_level)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_small, out), 3)
    assert np.array_equal(dec, msgs)


def test_seeded_keygen_roundtrip(rng):
    """Seeded keys: (k+1)x smaller, expand to a working keyset."""
    import jax.numpy as jnp
    from concrete_tpu.core import kernels as K2

    sk, seeded = kg.keygen_seeded(rng, P, seed=b"\9" * 32)
    full_bsk_bytes = (P.n_small * P.pbs_level * (P.glwe_dimension + 1) ** 2
                      * P.polynomial_size * 8)
    assert seeded.size_bytes < full_bsk_bytes / 2
    server = seeded.expand()
    p = 3
    lut = np.arange(8, dtype=np.uint64)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(np.arange(8), p),
                              P.lwe_std / 256)
    ksk = K2.pack_ksk(server.ksk, P)
    bsk = K2.pack_bsk(server.bsk, P)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, p)
    out = np.asarray(K2.pbs_batch(jnp.asarray(ct), ksk, bsk,
                                  jnp.asarray(lut_poly), P, p))
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, out), p)
    assert np.array_equal(dec, np.arange(8))
    # deterministic: same seed + same noise stream -> same bodies
    rng2 = np.random.default_rng(42)
    rng3 = np.random.default_rng(42)
    _, s2 = kg.keygen_seeded(rng2, P, seed=b"\7" * 32)
    _, s3 = kg.keygen_seeded(rng3, P, seed=b"\7" * 32)
    assert np.array_equal(s2.bsk_bodies, s3.bsk_bodies)
