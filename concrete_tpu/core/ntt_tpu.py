"""CRT-NTT external product on TPU — the O(N sqrt(N)) path for large N.

The banded-matmul external product (core/kernels.py) costs ~N^2 int8 MACs
per polynomial product; at N >= 2048 (6-bit+ partitions) that made the PBS
~25x slower than the 4-bit N=1024 configuration (RESULTS.md: 82 PBS/s/chip
at N=4096).  This module computes the SAME exact mod-2^64 result through
CRT over NTT-friendly primes:

  - 4 primes p = 1 (mod 2N) just below 2^31 (chosen so 2^31 mod p is small,
    making lazy modular folding cheap on the VPU);
  - negacyclic (psi-twisted) four-step NTTs where both sqrt(N)-point DFT
    stages are int8 limb-plane matmuls on the MXU (data residues split into
    4 balanced base-256 limbs, twiddle matrices pre-split host-side);
  - pointwise products and Garner/CRT recombination as elementwise u64 VPU
    ops (TPU's x64 rewrite emulates u64 mul with u32 pairs);
  - BSK polynomials pre-transformed per prime at pack time (the NTT analog
    of the reference's Fourier-domain BSK cache, Runtime/context.h:63-72).

MAC count per CMUX: Cin+(k+1) transforms x primes x N(n1+n2) x 16 int8 MACs
vs the banded path's ~Cin*A*8*2N^2 — a ~5x win at N=4096, a loss at N=1024
(where banded stays the default).  Everything is exact integer arithmetic:
results are bit-identical to the banded path and the numpy oracle.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu.core import limbs as lb
from concrete_tpu.core import ntt as ntt_host
from concrete_tpu.params import CryptoParams

U64 = jnp.uint64
MASK31 = (1 << 31) - 1


# ---------------------------------------------------------------------------
# Prime / plan construction (host side)
# ---------------------------------------------------------------------------

#: Shift-friendly NTT primes: p = 2^31 - (2^k - 1), so 2^31 = 2^k - 1
#: (mod p).  Tuples (p, k); two-adicity of p-1 is 17/19/24/25, so all
#: support N up to 2^16; 120 bits of CRT range.  Kept as a fallback when
#: the generic near-2^31 search comes up short (the Pallas path's
#: Montgomery arithmetic works with any odd prime, and the generic primes'
#: small 2^31-mod-p folds faster on the XLA path).
SHIFT_PRIMES: tuple = (
    (2147352577, 17),
    (2146959361, 19),
    (2130706433, 24),
    (2113929217, 25),
)


@functools.lru_cache(maxsize=None)
def ntt_primes_near_pow2(n: int, min_total_bits: int,
                         max_hi_bits: int = 22) -> tuple[int, ...]:
    """NTT primes p = 1 (mod 2n) just below 2^31 with 2^31 mod p <
    2^max_hi_bits (keeps the lazy fold's contraction strong), product
    >= min_total_bits; falls back to SHIFT_PRIMES if the search fails."""
    out = []
    total = 0
    k = (1 << 31) // (2 * n)
    k_min = ((1 << 31) - (1 << max_hi_bits)) // (2 * n)
    while total < min_total_bits and k >= k_min:
        p = k * 2 * n + 1
        if p < (1 << 31) and ntt_host.is_prime(p):
            out.append(p)
            total += p.bit_length() - 1
        k -= 1
    if total < min_total_bits:
        out = []
        total = 0
        for p, _k in SHIFT_PRIMES:
            if (p - 1) % (2 * n) == 0:
                out.append(p)
                total += p.bit_length() - 1
                if total >= min_total_bits:
                    return tuple(out)
        raise ValueError(
            f"not enough near-2^31 NTT primes for N={n} "
            f"(need {min_total_bits} bits, found {len(out)} primes)")
    return tuple(out)


def _center(vals: np.ndarray, p: int) -> np.ndarray:
    v = np.asarray(vals, dtype=np.int64) % p
    return np.where(v > p // 2, v - p, v)


def _split_planes(mat: np.ndarray, p: int) -> np.ndarray:
    """(K, L) mod-p matrix -> (K*4, L*7) i8 'limb-convolution' matrix W
    with W[k*4+a, l*7+(a+b)] = limb_b(centered(mat[k, l])).

    A single int8 matmul  X(M, K*4) @ W  then yields all seven 2^(8s)
    product planes at once: no scatter-accumulated plane buffer (the
    first version's (M, L, 7) at[].add chain was HBM-bound and 10x off
    the MXU roofline)."""
    c = _center(mat, p).astype(np.int32)
    limbs = lb.i32_digits_to_balanced_i8(c, 4)          # (K, L, 4)
    k_dim, l_dim = mat.shape
    w = np.zeros((k_dim, 4, l_dim, 7), dtype=np.int8)
    for a in range(4):
        for b in range(4):
            w[:, a, :, a + b] = limbs[:, :, b]
    return np.ascontiguousarray(w.reshape(k_dim * 4, l_dim * 7))


@dataclasses.dataclass(frozen=True)
class NttPlan:
    """Per-(N, prime) four-step transform tables (device arrays).

    All residue tensors between stages are u32 (residues < 2^31): the
    first u64 design moved 2x the bytes per stage, and the blind rotate
    is HBM-bound, not MXU-bound.  The negacyclic psi / psi^-1/N twists
    are FUSED into the stage matrices and twiddles (no separate
    elementwise twist passes):

      fwd:  dft1[i1,k1] *= psi^(i1*n2);  tw_f[i2,k1] = psi^i2 * w^(i2*k1)
      inv:  tw_i[k1,i2] = w^(-i2*k1) * psi^-i2 / N;
            idft1[k1,i1] *= psi^(-i1*n2)
    """
    p: int
    n1: int
    n2: int
    hi31: int                 # 2^31 mod p
    dft1: jnp.ndarray         # (n1*4, n1*7) i8 limb-conv [i1 -> k1], psi-fused
    dft2: jnp.ndarray         # (n2*4, n2*7) i8 [i2 -> k2]
    idft2: jnp.ndarray        # (n2*4, n2*7) i8 [k2 -> i2]
    idft1: jnp.ndarray        # (n1*4, n1*7) i8 [k1 -> i1], ipsi/N-fused
    tw_f: jnp.ndarray         # (n2, n1) u32 combined forward twiddle
    tw_i: jnp.ndarray         # (n1, n2) u32 combined inverse twiddle
    pow8: jnp.ndarray         # (7,) i64: 2^(8s) mod p


@functools.lru_cache(maxsize=None)
def build_plan(n: int, p: int) -> NttPlan:
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    g = ntt_host._primitive_root(p)
    psi = pow(g, (p - 1) // (2 * n), p)
    assert pow(psi, n, p) == p - 1
    w = psi * psi % p
    wi = pow(w, -1, p)
    psi_i = pow(psi, -1, p)
    w1, w2 = pow(w, n2, p), pow(w, n1, p)       # n1-th, n2-th roots
    w1i, w2i = pow(w1, -1, p), pow(w2, -1, p)
    n_inv = pow(n, -1, p)

    def dft_mat(m, root, row_scale=None, col_scale=None):
        pows = np.array([pow(root, int(e), p) for e in range(m)],
                        dtype=np.int64)
        ij = np.multiply.outer(np.arange(m), np.arange(m)) % m
        mat = pows[ij]
        if row_scale is not None:
            mat = mat * row_scale[:, None] % p
        if col_scale is not None:
            mat = mat * col_scale[None, :] % p
        return mat

    psi_i1n2 = np.array([pow(psi, i1 * n2, p) for i1 in range(n1)],
                        dtype=np.int64)
    ipsi_i1n2 = np.array([pow(psi_i, i1 * n2, p) for i1 in range(n1)],
                         dtype=np.int64)
    i2k1 = np.multiply.outer(np.arange(n2), np.arange(n1)) % n
    tw_f = np.array([[pow(w, int(e), p) * pow(psi, i2, p) % p
                      for e in row]
                     for i2, row in enumerate(i2k1)], dtype=np.uint32)
    k1i2 = np.multiply.outer(np.arange(n1), np.arange(n2)) % n
    tw_i = np.array([[pow(wi, int(e), p)
                      * (pow(psi_i, i2, p) * n_inv % p) % p
                      for i2, e in enumerate(row)]
                     for row in k1i2], dtype=np.uint32)
    pow8 = np.array([(1 << (8 * s)) % p for s in range(7)], dtype=np.int64)
    return NttPlan(
        p=p, n1=n1, n2=n2, hi31=(1 << 31) % p,
        dft1=jnp.asarray(_split_planes(
            dft_mat(n1, w1, row_scale=psi_i1n2), p)),
        dft2=jnp.asarray(_split_planes(dft_mat(n2, w2), p)),
        idft2=jnp.asarray(_split_planes(dft_mat(n2, w2i), p)),
        idft1=jnp.asarray(_split_planes(
            dft_mat(n1, w1i, col_scale=ipsi_i1n2), p)),
        tw_f=jnp.asarray(tw_f), tw_i=jnp.asarray(tw_i),
        pow8=jnp.asarray(pow8))


# ---------------------------------------------------------------------------
# Elementwise mod-p arithmetic (u64 VPU ops)
# ---------------------------------------------------------------------------

def _fold(c, plan: NttPlan, bound: int):
    """Lazy reduction of u64 c < bound to [0, p): repeatedly substitute
    2^31 -> (2^31 mod p) until the tracked bound fits 32 bits, then
    conditional subtractions.  The pass count adapts to the prime's
    contraction rate (hi31 < 2^22 for generic primes; 2^k - 1 for the
    SHIFT_PRIMES, which contract 31-k bits per pass)."""
    hi = U64(plan.hi31)
    while bound > (1 << 32):
        c = (c >> U64(31)) * hi + (c & U64(MASK31))
        bound = (bound >> 31) * plan.hi31 + (1 << 31)
    c = (c >> U64(31)) * hi + (c & U64(MASK31))   # now c < 2^31 + hi31 < 2p
    p = U64(plan.p)
    c = c - p * (c >= p).astype(U64)
    c = c - p * (c >= p).astype(U64)
    return c


def _mul_mod(a, b, plan: NttPlan):
    """u64 residues in [0, p) -> a*b mod p as u64 (product < 2^62)."""
    return _fold(a * b, plan, 1 << 62)


U32 = jnp.uint32


def _mul_mod32(a, b, plan: NttPlan):
    """u32 residues in [0, p) -> a*b mod p as u32 (the transform-path
    variant: inter-stage tensors stay u32, halving HBM traffic)."""
    return _fold(a.astype(U64) * b.astype(U64), plan, 1 << 62).astype(U32)


def _add_mod32(a, b, plan: NttPlan):
    """u32 residues in [0, p) -> (a + b) mod p as u32 (sum < 2^32)."""
    s = a + b
    p = U32(plan.p)
    return s - p * (s >= p).astype(U32)


# ---------------------------------------------------------------------------
# Mod-p matmul on the MXU (limb planes)
# ---------------------------------------------------------------------------

def _matmul_mod(x_res, rhs_planes, plan: NttPlan):
    """(..., K) residues in [0, p) @ (K, L) mod-p matrix -> (..., L).

    rhs_planes: (K*4, L*7) i8 limb-convolution matrix (_split_planes).
    Data residues are centered and split into 4 balanced i8 limbs laid out
    limb-minor, so ONE int8 matmul produces all seven 2^(8s) planes of the
    exact product; planes are then Horner-combined mod p with an i32
    pair-packing step that keeps the big i64 intermediate off HBM.
    """
    shape = x_res.shape[:-1]
    k_dim = x_res.shape[-1]
    l7 = rhs_planes.shape[-1]
    l_dim = l7 // 7
    flat = x_res.reshape(-1, k_dim)
    p = plan.p
    xc = flat.astype(jnp.int64)
    xc = jnp.where(xc > p // 2, xc - p, xc).astype(jnp.int32)
    limbs = lb.i32_digits_to_balanced_i8(xc, 4)          # (M, K, 4)
    m_dim = flat.shape[0]
    x8 = limbs.reshape(m_dim, k_dim * 4)
    planes = jnp.matmul(x8, rhs_planes, preferred_element_type=jnp.int32)
    planes = planes.reshape(m_dim, l_dim, 7)
    # |plane_s| <= K * 127^2 * 4; pack (even, odd) plane pairs into one i32
    # when 257x that bound stays below 2^30 (true for K <= 64), then a
    # 4-term Horner with CENTERED 2^16t-mod-p weights (|w| <= p/2 < 2^30)
    # keeps |c| <= 3*2^60 — bias + u64 fold stay in range
    bound = k_dim * 127 * 127 * 4
    if bound * 257 < (1 << 30):
        w16 = [(1 << (16 * t)) % p for t in range(4)]
        w16 = [w - p if w > p // 2 else w for w in w16]   # centered
        g0 = planes[:, :, 0] + planes[:, :, 1] * 256
        g1 = planes[:, :, 2] + planes[:, :, 3] * 256
        g2 = planes[:, :, 4] + planes[:, :, 5] * 256
        g3 = planes[:, :, 6]
        c = (g0.astype(jnp.int64)
             + g1.astype(jnp.int64) * jnp.int64(w16[1])
             + g2.astype(jnp.int64) * jnp.int64(w16[2])
             + g3.astype(jnp.int64) * jnp.int64(w16[3]))
    else:
        c = (planes.astype(jnp.int64) * plan.pow8).sum(axis=-1)
    bias = ((1 << 62) // p + 1) * p
    c = (c + jnp.int64(bias)).astype(U64)
    return _fold(c, plan, 1 << 63).astype(U32).reshape(shape + (l_dim,))


# ---------------------------------------------------------------------------
# Four-step negacyclic NTT (device)
# ---------------------------------------------------------------------------

def ntt_fwd(x_res, plan: NttPlan):
    """(..., N) residues in [0, p) -> (..., N) u32 spectrum (four-step
    layout: flat index k1*n2 + k2 holds natural frequency k2*n1 + k1).
    The negacyclic psi twist is fused into dft1 (psi^(i1*n2) row scale)
    and tw_f (psi^i2 factor) — no standalone twist pass."""
    n1, n2 = plan.n1, plan.n2
    shape = x_res.shape[:-1]
    y = x_res.reshape(shape + (n1, n2))                  # (..., i1, i2)
    y = jnp.swapaxes(y, -1, -2)                          # (..., i2, i1)
    y = _matmul_mod(y, plan.dft1, plan)                  # (..., i2, k1)
    y = _mul_mod32(y, plan.tw_f, plan)
    y = jnp.swapaxes(y, -1, -2)                          # (..., k1, i2)
    y = _matmul_mod(y, plan.dft2, plan)                  # (..., k1, k2)
    return y.reshape(shape + (n1 * n2,))


def ntt_inv(x_freq, plan: NttPlan):
    """Inverse of ntt_fwd; the psi^-i / N scaling is fused into tw_i
    (psi^-i2 / N) and idft1 (psi^(-i1*n2) column scale)."""
    n1, n2 = plan.n1, plan.n2
    shape = x_freq.shape[:-1]
    y = x_freq.reshape(shape + (n1, n2))                 # (..., k1, k2)
    y = _matmul_mod(y, plan.idft2, plan)                 # (..., k1, i2)
    y = _mul_mod32(y, plan.tw_i, plan)
    y = jnp.swapaxes(y, -1, -2)                          # (..., i2, k1)
    y = _matmul_mod(y, plan.idft1, plan)                 # (..., i2, i1)
    return jnp.swapaxes(y, -1, -2).reshape(shape + (n1 * n2,))


# ---------------------------------------------------------------------------
# Garner / CRT recombination to u64
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _garner_consts(primes: tuple):
    """Mixed-radix constants: inverses inv[p_i mod p_j] for i<j, the digits
    of (P-1)//2 (for sign centering) and P mod 2^64."""
    n = len(primes)
    inv = {}
    for j in range(1, n):
        for i in range(j):
            inv[(i, j)] = pow(primes[i], -1, primes[j])
    total = 1
    for p in primes:
        total *= p
    half = (total - 1) // 2
    # mixed-radix digits of half: half = h0 + p0*(h1 + p1*(h2 + ...))
    h_digits = []
    rem = half
    for p in primes:
        h_digits.append(int(rem % p))
        rem //= p
    return inv, tuple(h_digits), total % (1 << 64)


def garner_to_u64(residues: list, primes: tuple, plans: list):
    """Per-prime residues in [0, p_i) (u32 or u64) -> exact centered value
    mod 2^64."""
    inv, h_digits, total64 = _garner_consts(primes)
    n = len(primes)
    residues = [r.astype(U64) for r in residues]
    digits = [residues[0]]
    for j in range(1, n):
        plan = plans[j]
        p_j = U64(primes[j])
        t = residues[j]
        for i in range(j):
            # t = (t - digits[i]) * inv(p_i) mod p_j; digits[i] < p_i may
            # exceed p_j, so fold it into [0, p_j) first
            t = t + p_j - _fold(digits[i], plan, 1 << 32)
            t = _fold(t, plan, 1 << 33)
            t = _mul_mod(t, U64(inv[(i, j)]), plan)
        digits.append(t)
    # value mod 2^64 via Horner (u64 wrap is exact mod 2^64)
    v = digits[-1]
    for j in range(n - 2, -1, -1):
        v = v * U64(primes[j]) + digits[j]
    # center: subtract P when the mixed-radix digits exceed those of
    # (P-1)/2 — lexicographic compare, most significant digit outermost
    gt = None
    for j in range(n):
        h = U64(h_digits[j])
        gt_j = digits[j] > h
        eq_j = digits[j] == h
        gt = gt_j if gt is None else gt_j | (eq_j & gt)
    return v - U64(total64) * gt.astype(U64)


# ---------------------------------------------------------------------------
# BSK pre-transform (host, exact numpy) + external product (device)
# ---------------------------------------------------------------------------

@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["spectra"],
                   meta_fields=["primes", "base_log", "levels"])
@dataclasses.dataclass(frozen=True)
class NttBSK:
    """Bootstrap key pre-transformed per CRT prime.

    spectra: (primes, n, Cin, k+1, N) u32 — NTT (four-step layout) of the
    centered BSK polynomials mod each prime (residues < 2^31 fit u32, half
    the HBM of u64); Cin = lev*(k+1)+r like the banded planes.  The
    device-side analog of the reference's Fourier BSK.
    """
    spectra: jnp.ndarray
    primes: tuple
    base_log: int
    levels: int

    @property
    def n_small(self) -> int:
        return self.spectra.shape[1]


def _fwd_perm(n: int, n1: int) -> np.ndarray:
    """mine[k1*n2 + k2] = natural[k2*n1 + k1]."""
    n2 = n // n1
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k2 * n1 + k1).reshape(-1)


def required_crt_bits(params: CryptoParams) -> int:
    """|coeff| of sum_cin digit (*) bsk <= Cin * N * 2^(base_log-1) * 2^63."""
    cin = params.pbs_level * (params.glwe_dimension + 1)
    return (64 + (params.pbs_base_log - 1)
            + (params.polynomial_size * cin).bit_length() + 2)


def choose_primes(params: CryptoParams) -> tuple[int, ...]:
    return ntt_primes_near_pow2(params.polynomial_size,
                                required_crt_bits(params))


def pack_bsk_ntt(bsk_u64: np.ndarray, params: CryptoParams,
                 primes: tuple = None) -> NttBSK:
    """Pre-transform a u64 BSK (n, l, k+1, k+1, N) per CRT prime (host)."""
    if primes is None:
        primes = choose_primes(params)
    bsk_u64 = np.asarray(bsk_u64)
    n_small, l, kp1, _, n = bsk_u64.shape
    flat = bsk_u64.reshape(n_small, l * kp1, kp1, n)
    signed = flat.astype(np.int64)                     # centered (balanced)
    out = np.empty((len(primes), n_small, l * kp1, kp1, n), dtype=np.uint32)
    for pi, p in enumerate(primes):
        plan = build_plan(n, p)
        perm = _fwd_perm(n, plan.n1)
        nat = ntt_host.ntt_forward(signed % p, n, p)
        out[pi] = nat[..., perm].astype(np.uint32)
    return NttBSK(spectra=jnp.asarray(out), primes=tuple(primes),
                  base_log=params.pbs_base_log, levels=params.pbs_level)


def external_product_ntt(digits, bsk_step, primes: tuple,
                         params: CryptoParams):
    """One CMUX external product via CRT-NTT.

    digits: (B, Cin, N) i32 balanced gadget digits of the rotated diff;
    bsk_step: (primes, Cin, k+1, N) u32 spectra (one scan step's slice).
    Returns (B, k+1, N) u64 — bit-identical to the banded path's update.
    """
    n = params.polynomial_size
    residues = []
    plans = []
    for pi, p in enumerate(primes):
        plan = build_plan(n, p)
        plans.append(plan)
        # signed digits |d| < 2^(base_log-1) << p: bias into [0, p)
        bias = ((1 << 31) // p + 1) * p
        d_res = (digits.astype(jnp.int64) + jnp.int64(bias)).astype(U64)
        d_res = _fold(d_res, plan, 1 << 33).astype(U32)
        d_hat = ntt_fwd(d_res, plan)                   # (B, Cin, N) u32
        # pointwise contraction over Cin: (B, Cin, 1, N) * (Cin, k+1, N)
        spec = bsk_step[pi]                            # (Cin, k+1, N) u32
        prod = None
        for cin in range(d_hat.shape[1]):
            term = _mul_mod32(d_hat[:, cin, None, :], spec[cin], plan)
            prod = term if prod is None else _add_mod32(prod, term, plan)
        residues.append(ntt_inv(prod, plan))           # (B, k+1, N) u32
    return garner_to_u64(residues, primes, plans)


def blind_rotate_ntt(ct_small, bsk: NttBSK, lut_poly, params: CryptoParams):
    """Batched blind rotation with the CRT-NTT external product: (B, n+1)
    u64 + (N,) LUT -> accumulator (B, k+1, N) u64.  Bit-identical to
    kernels.blind_rotate; preferable when N >= 2048 (see module docstring).
    """
    from concrete_tpu.core import kernels as kn
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    switched = kn.modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]
    b_t = switched[:, -1]
    body0 = kn._lut_rows(lut_poly, b_ct, n)
    body0 = kn.monomial_mul_rolls(body0, (2 * n - b_t) % (2 * n))
    acc0 = jnp.zeros((b_ct, k + 1, n), dtype=U64).at[:, k, :].set(
        body0[:, 0, :])
    spectra_steps = jnp.moveaxis(bsk.spectra, 1, 0)   # (n_small, primes, ...)

    def step(acc, xs):
        a_j, spec_j = xs
        rot = kn.monomial_mul_rolls(acc, a_j)
        diff = rot - acc
        digits = kn.decompose(diff, params.pbs_base_log, l)  # (B,k+1,N,l)
        d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(
            b_ct, l * (k + 1), n)
        ext = external_product_ntt(d, spec_j, bsk.primes, params)
        return acc + ext, None

    acc, _ = jax.lax.scan(step, acc0, (a_t.T, spectra_steps))
    return acc
