"""Exactness tests for the fused Pallas NTT kernels (interpret mode on CPU)
against the host NTT oracle and the XLA CRT-NTT path.
"""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import ntt as ntt_host
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.ops import pallas_ntt as pn


def _fwd_perm(n: int, n1: int) -> np.ndarray:
    """mine[k1*n2 + k2] = natural[k2*n1 + k1] for this plan's n1."""
    n2 = n // n1
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k2 * n1 + k1).reshape(-1)


@pytest.mark.parametrize("n", [256, 512])
def test_fwd_matches_host_oracle(rng, n):
    p = nt.ntt_primes_near_pow2(n, 60)[0]
    plan = pn.build_pallas_plan(n, p)
    digits = rng.integers(-(1 << 20), 1 << 20, (8, n)).astype(np.int32)
    got = np.asarray(pn.ntt_fwd_pallas(jnp.asarray(digits), plan,
                                       interpret=True))
    nat = ntt_host.ntt_forward(digits.astype(np.int64) % p, n, p)
    perm = _fwd_perm(n, plan.n1)
    assert np.array_equal(got, nat[..., perm].astype(np.uint32))


@pytest.mark.parametrize("n", [256, 512])
def test_fwd_inv_roundtrip(rng, n):
    for p in nt.ntt_primes_near_pow2(n, 90):
        plan = pn.build_pallas_plan(n, p)
        digits = rng.integers(-(1 << 24), 1 << 24, (4, n)).astype(np.int32)
        spec = pn.ntt_fwd_pallas(jnp.asarray(digits), plan, interpret=True)
        back = np.asarray(pn.ntt_inv_pallas(spec, plan, interpret=True))
        want = (digits.astype(np.int64) % p).astype(np.uint32)
        assert np.array_equal(back, want)


def test_montgomery_primitives(rng):
    """_mul_pair and _redc against Python big-int arithmetic."""
    p = 2146959361
    p_neg_inv = (-pow(p, -1, 1 << 32)) % (1 << 32)
    a = rng.integers(0, 1 << 32, 256, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, 256, dtype=np.uint32)
    hi, lo = pn._mul_pair(jnp.asarray(a.reshape(16, 16)),
                          jnp.asarray(b.reshape(16, 16)))
    prod = a.astype(object) * b.astype(object)
    assert np.array_equal(np.asarray(hi).reshape(-1),
                          (prod >> 32).astype(np.uint64).astype(np.uint32))
    assert np.array_equal(np.asarray(lo).reshape(-1),
                          (prod & 0xFFFFFFFF).astype(np.uint64)
                          .astype(np.uint32))
    # REDC of a*b_mont == a*b mod p
    am = a % p
    bm = b % p
    b_mont = (bm.astype(object) << 32) % p
    got = pn._mont_mul(jnp.asarray(am.reshape(16, 16)),
                       jnp.asarray(b_mont.astype(np.uint64)
                                   .astype(np.uint32).reshape(16, 16)),
                       p, p_neg_inv)
    want = (am.astype(object) * bm) % p
    assert np.array_equal(np.asarray(got).reshape(-1).astype(object), want)


def test_limbs4_i32(rng):
    x = rng.integers(-(1 << 31), 1 << 31, (8, 128), dtype=np.int64)
    x = x.astype(np.int32)
    limbs = np.asarray(pn._limbs4_i32(jnp.asarray(x))).astype(np.int64)
    limbs = limbs.reshape(8, 4, 128)     # limb-major along lanes
    recon = sum(limbs[:, i, :] << (8 * i) for i in range(4))
    # recombination wraps mod 2^32, matching the i32 input
    assert np.array_equal(recon.astype(np.int32), x)
    assert limbs.min() >= -128 and limbs.max() <= 127
