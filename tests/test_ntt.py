"""CRT-NTT groundwork tests: exact negacyclic products vs the oracle."""

import numpy as np
import pytest

from concrete_tpu.core import ntt
from concrete_tpu.core import refimpl as ref


def test_prime_selection():
    ps = ntt.ntt_primes(1024, 96)
    assert sum(p.bit_length() - 1 for p in ps) >= 96
    for p in ps:
        assert (p - 1) % 2048 == 0
        assert ntt.is_prime(p)


@pytest.mark.parametrize("n", [64, 256])
def test_ntt_roundtrip(n):
    ps = ntt.ntt_primes(n, 40)
    p = ps[0]
    rng = np.random.default_rng(0)
    a = rng.integers(0, p, (3, n)).astype(np.int64)
    back = ntt.ntt_inverse(ntt.ntt_forward(a, n, p), n, p)
    assert np.array_equal(back % p, a % p)


@pytest.mark.parametrize("n", [64, 128])
def test_crt_polymul_matches_oracle(n):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 64, (2, n), dtype=np.uint64)
    b = rng.integers(-(1 << 15), 1 << 15, (2, n)).astype(np.int64)
    got = ntt.negacyclic_polymul_crt(a, b)
    for i in range(2):
        want = ref.negacyclic_polymul(b[i].astype(np.uint64), a[i])
        assert np.array_equal(got[i], want), i
