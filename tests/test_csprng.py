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
