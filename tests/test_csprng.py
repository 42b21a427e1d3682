"""CSPRNG tests: RFC 8439 vector + statistical sanity + keygen integration."""

import numpy as np
import pytest

from concrete_tpu.utils import csprng


def test_chacha20_rfc8439_vector():
    s = csprng.ChaCha20Stream(seed=csprng.RFC8439_KEY,
                              nonce=csprng.RFC8439_NONCE)
    s.counter = 1  # RFC vector uses block counter 1
    out = s.random_bytes(16)
    assert out == csprng.RFC8439_BLOCK1_HEAD


def test_stream_determinism_and_divergence():
    a = csprng.ChaCha20Stream(seed=b"\1" * 32)
    b = csprng.ChaCha20Stream(seed=b"\1" * 32)
    c = csprng.ChaCha20Stream(seed=b"\2" * 32)
    x = a.random_u64((64,))
    assert np.array_equal(x, b.random_u64((64,)))
    assert not np.array_equal(x, c.random_u64((64,)))
    # stream continues, no repetition
    assert not np.array_equal(x, a.random_u64((64,)))


def test_generator_adapter_uniform_and_normal():
    g = csprng.SecureGenerator(seed=b"\3" * 32)
    u = g.integers(0, 1 << 64, size=10000, dtype=np.uint64)
    assert abs(float(np.mean(u / 2.0 ** 64)) - 0.5) < 0.02
    bits = g.integers(0, 2, size=10000)
    assert 0.45 < bits.mean() < 0.55
    z = g.normal(0.0, 1.0, size=10000)
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 1.0) < 0.05


def test_keygen_with_secure_generator():
    from concrete_tpu.core import keygen as kg
    from concrete_tpu.core import refimpl as ref
    from concrete_tpu.params import TEST_PARAMS_TINY as P

    g = csprng.SecureGenerator(seed=b"\4" * 32)
    sk, server = kg.keygen(g, P)
    ct = kg.encrypt_lwe_batch(g, sk.lwe_big, ref.encode(np.arange(4), 3),
                              P.lwe_std / 16)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, ct), 3)
    assert np.array_equal(dec, np.arange(4))


def test_secure_integers_non_power_of_two():
    from concrete_tpu.utils.csprng import SecureGenerator
    g = SecureGenerator(b"range-test")
    x = g.integers(0, 5, size=20000)
    assert x.min() >= 0 and x.max() <= 4
    counts = np.bincount(x, minlength=5)
    # unbiased rejection sampling: each bucket within 10% of uniform
    assert np.all(np.abs(counts - 4000) < 400), counts
    y = g.integers(-3, 10, size=5000)
    assert y.min() >= -3 and y.max() <= 9
    assert set(np.unique(y)) == set(range(-3, 10))


def test_secure_integers_int_seed_deterministic():
    from concrete_tpu.utils.csprng import SecureGenerator
    a = SecureGenerator(1234).integers(0, 1 << 64, size=16, dtype=np.uint64)
    b = SecureGenerator(1234).integers(0, 1 << 64, size=16, dtype=np.uint64)
    assert np.array_equal(a, b)


def test_keys_generate_uses_chacha_and_is_seed_deterministic():
    """Production keygen must draw from the ChaCha CSPRNG (round-1 advisor
    finding: it silently used PCG64) and be reproducible from a seed."""
    from concrete_tpu.compilation.keys import Keys
    from concrete_tpu.params import TEST_PARAMS_TINY

    k1 = Keys(TEST_PARAMS_TINY)
    k1.generate(seed=7)
    k2 = Keys(TEST_PARAMS_TINY)
    k2.generate(seed=7)
    assert np.array_equal(k1.secret.lwe_small, k2.secret.lwe_small)
    assert np.array_equal(k1.secret.glwe, k2.secret.glwe)
    assert np.array_equal(k1.server.bsk, k2.server.bsk)
    k3 = Keys(TEST_PARAMS_TINY)
    k3.generate(seed=8)
    assert not np.array_equal(k1.secret.lwe_small, k3.secret.lwe_small)


def test_no_default_rng_on_crypto_paths():
    """Grep-level guarantee (VERDICT item 7): key generation and encryption
    source must not reference numpy's default_rng."""
    import inspect

    from concrete_tpu.compilation import client, keys
    for mod in (client, keys):
        assert "default_rng" not in inspect.getsource(mod), mod.__name__
