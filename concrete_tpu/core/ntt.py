"""Negacyclic NTT over CRT primes — groundwork for the O(N log N) PBS path.

The banded-matmul external product costs ~N^2 int8 MACs per polynomial
product; an exact NTT path costs O(N log N) butterflies (or 2 N sqrt(N) MACs
in four-step matmul form) and is the round-2 speed lever (RESULTS.md).

This module provides the *exact arithmetic core*, validated against the
numpy oracle:

- NTT-friendly prime selection (p = 1 mod 2N) with primitive 2N-th roots;
- negacyclic (psi-twisted) forward/inverse transforms;
- exact negacyclic polynomial products mod 2^64 via CRT over enough primes
  to cover the integer product range.

It intentionally runs in int64 (exact on CPU/x64; TPU-ready limb splitting
of the modular arithmetic is the integration step, not done yet).
"""

from __future__ import annotations

import functools

import numpy as np


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def ntt_primes(n: int, min_total_bits: int, max_prime_bits: int = 31
               ) -> tuple[int, ...]:
    """Primes p = 1 (mod 2n), each < 2^max_prime_bits, whose product covers
    min_total_bits bits."""
    out = []
    total = 0
    k = (1 << max_prime_bits) // (2 * n)
    while total < min_total_bits and k > 0:
        p = k * 2 * n + 1
        if p < (1 << max_prime_bits) and is_prime(p):
            out.append(p)
            total += p.bit_length() - 1
        k -= 1
    if total < min_total_bits:
        raise ValueError(
            f"not enough NTT-friendly primes below 2^{max_prime_bits} "
            f"for N={n}, need {min_total_bits} bits")
    return tuple(out)


def _primitive_root(p: int) -> int:
    factors = []
    m = p - 1
    d = 2
    while d * d <= m:
        if m % d == 0:
            factors.append(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        factors.append(m)
    for g in range(2, p):
        if all(pow(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise ValueError("no primitive root")


@functools.lru_cache(maxsize=None)
def psi_tables(n: int, p: int):
    """(psi^i, psi^-i, n^-1) tables for the negacyclic twist: psi has order
    2n mod p."""
    g = _primitive_root(p)
    psi = pow(g, (p - 1) // (2 * n), p)
    assert pow(psi, n, p) == p - 1  # psi^n = -1: negacyclic
    psis = np.array([pow(psi, int(i), p) for i in range(n)], dtype=np.int64)
    ipsis = np.array([pow(psi, -int(i) % (2 * n), p) for i in range(n)],
                     dtype=np.int64)
    n_inv = pow(n, -1, p)
    omega = psi * psi % p
    ij = np.multiply.outer(np.arange(n), np.arange(n)) % n
    w_pows = np.array([pow(omega, int(i), p) for i in range(n)],
                      dtype=np.int64)
    iw_pows = np.array([pow(pow(omega, -1, p), int(i), p) for i in range(n)],
                       dtype=np.int64)
    dft = w_pows[ij]
    idft = iw_pows[ij]
    return psis, ipsis, n_inv, dft, idft


def _matmod(a: np.ndarray, m: np.ndarray, p: int) -> np.ndarray:
    """(a @ m) mod p, exact, BLAS-fast for p < 2^31.

    Both operands are split into 16-bit halves so each f64 matmul stays
    exactly representable (|partial sums| <= K * 2^32 < 2^53 for K <= 2^20),
    then the four limb products recombine mod p in int64.
    """
    if a.shape[1] > (1 << 20):
        raise ValueError("contraction too long for the exact f64 path")
    a_lo = (a & 0xFFFF).astype(np.float64)
    a_hi = (a >> 16).astype(np.float64)
    m_lo = (m & 0xFFFF).astype(np.float64)
    m_hi = (m >> 16).astype(np.float64)
    c00 = (a_lo @ m_lo).astype(np.int64) % p
    c01 = (a_lo @ m_hi).astype(np.int64)
    c10 = (a_hi @ m_lo).astype(np.int64)
    c11 = (a_hi @ m_hi).astype(np.int64) % p
    mid = (c01 + c10) % p
    out = (c00 + mid * ((1 << 16) % p) % p + c11 * ((1 << 32) % p) % p) % p
    return out


def ntt_forward(polys: np.ndarray, n: int, p: int) -> np.ndarray:
    """Negacyclic forward transform of (..., n) int64 coefficients mod p."""
    psis, _, _, dft, _ = psi_tables(n, p)
    a = (polys % p) * psis % p
    return _matmod(a.reshape(-1, n), dft.T, p).reshape(polys.shape)


def ntt_inverse(vals: np.ndarray, n: int, p: int) -> np.ndarray:
    _, ipsis, n_inv, _, idft = psi_tables(n, p)
    a = _matmod(vals.reshape(-1, n) % p, idft.T, p)
    return (a * n_inv % p) * ipsis % p


def negacyclic_polymul_crt(a_u64: np.ndarray, b_small: np.ndarray
                           ) -> np.ndarray:
    """Exact negacyclic product (mod 2^64) of u64 polys with small signed
    polys via CRT-NTT.  Oracle-checked against refimpl.negacyclic_polymul."""
    n = a_u64.shape[-1]
    b_max = int(np.abs(b_small).max()) if b_small.size else 1
    # |integer product coeff| <= n * 2^63 * b_max (balanced a)
    need_bits = 64 + max(b_max, 1).bit_length() + n.bit_length() + 2
    primes = ntt_primes(n, need_bits)
    # balanced representation of a keeps residue products small
    a_bal = a_u64.astype(np.int64)  # wraps: values in [-2^63, 2^63)
    residues = []
    for p in primes:
        ar = ntt_forward(a_bal % p, n, p)
        br = ntt_forward(b_small % p, n, p)
        prod = ar * br % p
        residues.append(ntt_inverse(prod, n, p))
    # CRT combine mod 2^64 (python ints for the 128-bit intermediates)
    total = 1
    for p in primes:
        total *= p
    coeffs = np.zeros(a_u64.shape, dtype=np.uint64)
    flat = coeffs.reshape(-1)
    res_flat = [r.reshape(-1) for r in residues]
    half = total // 2
    for i in range(flat.shape[0]):
        x = 0
        for p, r in zip(primes, res_flat):
            q = total // p
            x += int(r[i]) * q * pow(q, -1, p)
        x %= total
        if x > half:
            x -= total
        flat[i] = np.uint64(x % (1 << 64))
    return coeffs
