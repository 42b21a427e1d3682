"""Single-kernel CRT-NTT blind rotation — the N >= 2048 throughput path.

Round-3 measurements (RESULTS.md) showed the per-stage Pallas CRT-NTT
kernels are exact but the full external-product step costs 4-6x the sum of
its parts: 22 pallas_calls per blind-rotate step round-trip every
intermediate (residues, spectra, products) through HBM, and the XLA glue
between them (reshape/concat/moveaxis) adds more.  This module is the
cross-stage-fused redesign:

- **The entire blind rotation is ONE `pallas_call`** with grid
  (B/R, n_small), step index innermost.  The accumulator block index
  depends only on the batch-block coordinate, so Mosaic keeps it resident
  in VMEM across all n_small steps (the revisited-output accumulator
  pattern) and HBM sees it exactly twice per batch block.  Rotate,
  gadget decompose, forward NTT, spectral contraction, inverse NTT,
  Garner/CRT recombination and the u64 accumulation all happen inside the
  kernel; the only HBM stream is the per-step BSK spectra slice, which
  Pallas double-buffers against compute.
- **3 CRT primes instead of 4 via BSK bit-truncation**: dropping the low
  t bits of the (centered) BSK coefficients means the convolution result
  is only needed mod 2^(64-t); t >= ~8 shrinks the exact-range
  requirement under 3 near-2^31 primes at a provably negligible noise
  cost (params.variance_bsk_truncation_bits; same budget machinery as the
  banded path's limb truncation).  25% less work everywhere.
- **Shared stage-2 DFT matrices + separate Shoup twiddles** instead of the
  per-k1 twiddle-folded matrices of ops/pallas_ntt.py: tables shrink from
  ~8.4 MB per prime (HBM-streamed every step) to ~0.6 MB per prime,
  ALL VMEM-resident for the whole scan.  Twiddle/pointwise multiplies use
  Shoup's precomputed-quotient trick (b_sh = floor(b * 2^32 / p)):
  ~18 VPU ops per modular multiply vs ~30 for Montgomery-REDC, valid for
  any u32 input and exact.
- **Special-form primes p = 2^31 - d*2^14 + 1** (round 4): 2^32 ≡ e
  (mod p) with e < 2^21, so the plane-combine after every limb matmul
  reduces its u32 pair with three cheap multiplies instead of a
  Montgomery REDC (the combine was 45% of the step), and emits LAZY
  (non-canonical) residues that every consumer — Shoup multiplies, limb
  matmuls, the Garner c_i chains — absorbs for free by mod-p linearity.
- **Digit-width-aware int8 limb split**: balanced gadget digits satisfy
  |d| <= 2^(base_log - 1), so the forward stage-1 lhs needs only
  ceil((base_log + 1) / 8) int8 limbs (3 for the 6-bit N=4096 parameters)
  instead of 4 — 25% off the stage-1 MACs.
- **Table-as-LHS stage-1 and inverse-final matmuls** (round 4, second
  session): stage 1 computes y = A1^T @ x_m per batch row (constant
  transform matrix as the matmul LHS, limbs of the data stacked along
  SUBLANES) instead of y = x^T @ A1 with lane-limbs.  Consequences:
  stage 1 consumes the natural [i1-rows, i2-lanes] coefficient layout
  directly and emits [k1-rows, i2-lanes] — the layout the twiddle and
  stage 2 want — and the inverse's final stage emits natural coefficient
  order, so the kernel contains ZERO transposes (the former _swap12
  relayouts) and ZERO sub-128-lane arrays: every VPU op (limb split,
  centering, plane combine, Shoup/twiddle, Garner) runs at full lane
  width, and every plane-combine slice is a sublane-aligned ROW slice.
  This replaces the round-4 "pack 4 rows into lanes" plan (NOTES.md):
  same fix for the measured hot spot (the 4L->L sub-lane combine slices
  + 25%-occupancy stage-1 ops were ~41% of the step) without the 4x
  block-diagonal MAC blowup or any interstage repacking; the cost is
  one small (4*n1, dl*n1)@(dl*n1, 128) matmul per batch row (m
  unrolled) instead of one large batched matmul.

Reference parity: device analog of the reference's FFT-domain bootstrap
inner loop (concrete `lib/Runtime/wrappers.cpp:762` bootstrap via
fourier-domain BSK cached in RuntimeContext, `context.h:63-72`); the
reference has no NTT/TPU path — this design is original.  Semantics
(rotation, decomposition, external product, accumulator) are bit-exact
against core/refimpl.py on the truncated BSK (tests/test_fused_ntt.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from concrete_tpu.core import ntt as ntt_host
from concrete_tpu.ops.pallas_ntt import (
    N2,
    _lt_u32,
    _mul_pair,
    _on_tpu,
    _shl16,
    _shr16,
)
from concrete_tpu.params import CryptoParams

U32 = jnp.uint32
I32 = jnp.int32
_I0 = np.int32(0)

# perf-ablation switch for tools/ablate_fused_step.py ONLY: comma-separated
# phase names to skip ("fwd", "inv", "pointwise", "garner", "rotate",
# "twiddle").  Results are wrong when non-empty; never set in production.
import os as _os

_ABLATE = frozenset(
    s for s in _os.environ.get("CONCRETE_TPU_FUSED_ABLATE", "").split(",")
    if s)


# ---------------------------------------------------------------------------
# Prime / truncation choice
# ---------------------------------------------------------------------------

def digit_limbs(base_log: int) -> int:
    """int8 limbs needed for balanced digits |d| <= 2^(base_log-1)."""
    return max(1, math.ceil((base_log + 1) / 8))


def required_bits(params: CryptoParams, trunc_bits: int) -> int:
    """Exact-CRT range for the external product with a t-bit-truncated BSK.

    |sum_cin sum_poly digit * (bsk >> t)| <= Cin * N * 2^(base_log-1) *
    2^(63-t); +1 for sign, +1 safety.
    """
    cin = params.pbs_level * (params.glwe_dimension + 1)
    return ((64 - trunc_bits) + (params.pbs_base_log - 1)
            + (params.polynomial_size * cin).bit_length() + 2)


def _is_prime(n: int) -> bool:
    if n < 2 or n % 2 == 0:
        return n == 2
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):  # exact < 3e24
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
def special_ntt_primes(n: int, min_total_bits: int) -> tuple:
    """NTT primes of the special form p = 2^31 - d*m + 1 with
    m = max(2N, 2^14), so 2N | p-1 (negacyclic transforms exist) AND
    e = 2^32 mod p = 2*d*m - 2 < 2^22, letting the plane-combine reduce
    a u32 pair mod p in ~3 cheap multiplies (no Montgomery REDC)."""
    m = max(2 * n, 1 << 14)
    d_max = (1 << 21) // m            # keeps e = 2*d*m - 2 < 2^22
    assert d_max >= 8, f"N={n} too large for the special prime family"
    out, total_bits = [], 0
    for d in range(1, d_max + 1):
        p = (1 << 31) - d * m + 1
        if _is_prime(p):
            out.append(p)
            total_bits += 31
            if total_bits >= min_total_bits + 31:
                break
    return tuple(out)


def choose_fused_primes(params: CryptoParams, message_bits: int = None,
                        norm2: int = 1) -> tuple[tuple, int]:
    """(primes, trunc_bits): fewest special-form NTT primes whose range
    covers the external product after a noise-budget-validated BSK
    truncation."""
    from concrete_tpu import params as pp
    pool = special_ntt_primes(params.polynomial_size, 128)
    req0 = required_bits(params, 0)
    for count in range(2, len(pool) + 1):
        ps = pool[:count]
        cap = (math.prod(ps)).bit_length() - 1
        t = max(0, req0 - cap)
        if t == 0:
            return tuple(ps), 0
        if t >= 48:
            continue
        added = pp.variance_bsk_truncation_bits(
            params.n_small, params.glwe_dimension, params.polynomial_size,
            params.pbs_base_log, params.pbs_level, t,
            params.q_log) * float(norm2) ** 2
        if message_bits is not None:
            from concrete_tpu.optimizer.v0 import safe_variance_bound
            budget = safe_variance_bound(message_bits, 6.3e-5) * 0.05
        else:
            # self-contained fallback: stay well under the intrinsic
            # blind-rotate noise of these parameters
            budget = 0.01 * pp.variance_blind_rotate(
                params.n_small, params.glwe_dimension,
                params.polynomial_size, params.pbs_base_log,
                params.pbs_level, params.glwe_std ** 2, params.q_log)
        if added <= budget:
            return tuple(ps), t
    return tuple(pool), max(0, req0 - (math.prod(pool).bit_length() - 1))


def truncate_bsk_u64(bsk_u64: np.ndarray, trunc_bits: int) -> np.ndarray:
    """Zero the low t bits of every BSK coefficient (the oracle's key)."""
    if trunc_bits == 0:
        return np.asarray(bsk_u64)
    b = np.asarray(bsk_u64, dtype=np.uint64)
    return (b >> np.uint64(trunc_bits)) << np.uint64(trunc_bits)


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------

def _center_i64(vals: np.ndarray, p: int) -> np.ndarray:
    v = np.asarray(vals, dtype=np.int64) % p
    return np.where(v > p // 2, v - p, v)


def _limb_i8(vals: np.ndarray, limbs: int) -> np.ndarray:
    from concrete_tpu.core import limbs as lb
    return np.asarray(lb.i32_digits_to_balanced_i8(
        vals.astype(np.int32), limbs))


def _premult_planes_limbs(mat: np.ndarray, p: int, in_limbs: int) -> np.ndarray:
    """(K, L) mod-p matrix -> (in_limbs*K, 4*L) int8 limb-convolution
    planes:

      W[a*K + k, t*L + l] = limb_t(center(mat[k,l] * 2^(8a) mod p))

    so limbs(x) @ W yields 4 planes P_t with sum_t P_t * 2^(8t) ==
    (x @ mat) (mod p) for ANY integer x representable in `in_limbs`
    balanced int8 limbs (x need not be reduced mod p).  Rows limb-MAJOR,
    output columns plane-MAJOR (matches _limbs/_combine_special lane
    layouts).  The combine's pair packing g_j = P_2j + 256*P_2j+1 must be
    exact in i32: checked EXACTLY per output lane against the built table
    (replaces the round-3 k_dim heuristic, which understated the bound
    4x for the 4-limb stage-2 tables).
    """
    k_dim, l_dim = mat.shape
    out = np.empty((in_limbs, k_dim, 4, l_dim), dtype=np.int8)
    m64 = np.asarray(mat, dtype=np.int64) % p
    for a in range(in_limbs):
        weight = pow(2, 8 * a, p)
        scaled = m64 * weight % p
        out[a] = np.moveaxis(_limb_i8(_center_i64(scaled, p), 4), -1, 1)
    w = np.ascontiguousarray(out.reshape(in_limbs * k_dim, 4 * l_dim))
    _assert_pair_exact(np.abs(w.astype(np.int64)).sum(axis=0)
                       .reshape(4, l_dim))
    return w


def _assert_pair_exact(s_planes: np.ndarray) -> None:
    """s_planes (4, L) = per-output column sums of |table int8 limbs|.
    With |data limb| <= 128, |P_t| <= 128 * S_t; the combine's plane-pair
    packing P_2j + 256*P_2j+1 must stay within i32."""
    bound = 128 * (s_planes[::2] + 256 * s_planes[1::2])
    assert int(bound.max()) < (1 << 31), int(bound.max())


def _premult_planes_lhs(mat: np.ndarray, p: int, in_limbs: int) -> np.ndarray:
    """(K, L) mod-p matrix -> (4*L, in_limbs*K) int8 table-as-LHS planes:

      W[t*L + o, a*K + k] = limb_t(center(mat[k, o] * 2^(8a) mod p))

    so W @ rowlimbs(x) (x: (K, J) with limbs stacked along SUBLANES,
    limb-major) yields plane-major ROWS: planes[t*L:(t+1)*L, :] with
    sum_t P_t * 2^(8t) == mat^T @ x (mod p).  Used for the transforms
    whose data-as-LHS form would produce sub-128-lane outputs (fwd
    stage 1, inverse final stage): the output rows are the TRANSFORMED
    index (k1 resp. i1), so the result lands directly in the layout the
    next phase consumes — no transposes, and the plane combine slices
    rows, not lanes.
    """
    k_dim, l_dim = mat.shape
    out = np.empty((4, l_dim, in_limbs, k_dim), dtype=np.int8)
    m64 = np.asarray(mat, dtype=np.int64) % p
    for a in range(in_limbs):
        weight = pow(2, 8 * a, p)
        scaled = m64 * weight % p                       # (K, L)
        limbs = _limb_i8(_center_i64(scaled, p), 4)     # (K, L, 4)
        out[:, :, a, :] = np.moveaxis(limbs, (0, 1, 2), (2, 1, 0))
    w = np.ascontiguousarray(out.reshape(4 * l_dim, in_limbs * k_dim))
    _assert_pair_exact(np.abs(w.astype(np.int64)).sum(axis=1)
                       .reshape(4, l_dim))
    return w


def _shoup_pair(vals: np.ndarray, p: int):
    """(val, floor(val * 2^32 / p)) as u32 arrays; vals in [0, p)."""
    v = np.asarray(vals, dtype=np.uint64)
    sh = (v << np.uint64(32)) // np.uint64(p)
    return v.astype(np.uint32), sh.astype(np.uint32)


@dataclasses.dataclass(frozen=True)
class FusedTables:
    """Stacked per-prime device tables for the fused step kernel.

    All tables together are ~0.6 MB per prime and stay VMEM-resident for
    the entire scan (constant block indices).

    Limb encodings (round 5): the kernel's in-kernel limb splits are
    BIASED two's-complement byte extractions (l_a = byte_a ^ 0x80, value
    byte_a - 128; top digit limb plain arithmetic shift) — 2-3 VPU ops per
    limb instead of the balanced-carry chain's ~6, and a lazy u32 splits
    into exactly 4 rows (the former 2^32-carry fifth row is gone).  The
    constant +128 bias contributes C * colsum(mat) per output (C =
    128 * sum_a 2^(8a) over the biased limb rows), which the builder folds
    into the pair-twiddle bias tables (stage-1 fwd, inverse stage-1) and
    into per-lane/per-row combine offset vectors (dft2_off, v1i_off).
    """
    primes: tuple
    e_consts: tuple            # 2^32 mod p (special form: < 2^21)
    off_mods: tuple            # (2^31 + 2^47) mod p (pair-packing bias)
    n1: int
    dl: int                    # digit int8 limbs (stage-1 lhs width)
    w1f: jnp.ndarray           # (P, 4*n1, dl*n1) i8 fwd stage-1 LHS [i1->k1]
    dft2: jnp.ndarray          # (P, 4*n2, 4*n2) i8 fwd stage-2 [i2 -> k2]
    dft2_off: jnp.ndarray      # (P, 1, n2) u32 combine offset incl. bias corr
    v1i_off: jnp.ndarray       # (P, n1, n2) u32 combine offset (per i1 row,
    #                            lane-broadcast: lane-dim-1 blocks don't lower)
    idft2: jnp.ndarray         # (P, 4*n2, 4*n2) i8 inv stage-1 [k2 -> i2]
    v1i: jnp.ndarray           # (P, 4*n1, 4*n1) i8 inv stage-2 LHS [k1->i1]
    twf_val: jnp.ndarray       # (P, n1, n2) u32 fwd twiddle [k1, i2]
    twf_sh: jnp.ndarray        # Shoup companion
    twi_val: jnp.ndarray       # (P, n1, n2) u32 inv twiddle [k1, i2]
    twi_sh: jnp.ndarray
    # pair-twiddle companions (round 4, session 2): tw*2^16 mod p Shoup
    # pairs + the bias-correction constant tw*((2^31+2^47) mod p) mod p,
    # letting the twiddle consume the plane pair (g0, g1) directly —
    # the combine+twiddle pair costs 2 lazy Shoup muls + 1 lazy add +
    # 1 lazy sub instead of a full pair reduction followed by a Shoup mul
    twf16_val: jnp.ndarray     # (P, n1, n2) u32
    twf16_sh: jnp.ndarray
    twf_bias: jnp.ndarray      # (P, n1, n2) u32 tw*off mod p
    twi16_val: jnp.ndarray
    twi16_sh: jnp.ndarray
    twi_bias: jnp.ndarray


@functools.lru_cache(maxsize=None)
def build_fused_tables(n: int, primes: tuple, dl: int,
                       group: int = 1) -> FusedTables:
    assert n % N2 == 0 and n // N2 >= 8, f"fused NTT needs N >= 1024, got {n}"
    n1 = n // N2

    def _grouped(w):
        # g-way block-diagonal expansion for _mm_combine_lhs: one MXU op
        # per g batch slabs
        return w if group == 1 else np.kron(
            np.eye(group, dtype=np.int8), w)
    w1f, dft2, idft2, v1i = [], [], [], []
    dft2_off, v1i_off = [], []
    twfv, twfs, twiv, twis = [], [], [], []
    twf16v, twf16s, twfb = [], [], []
    twi16v, twi16s, twib = [], [], []
    e_consts, off_mods = [], []
    for p in primes:
        g = ntt_host._primitive_root(p)
        psi = pow(g, (p - 1) // (2 * n), p)
        assert pow(psi, n, p) == p - 1
        w = psi * psi % p
        w1, w2 = pow(w, N2, p), pow(w, n1, p)       # order n1, order n2
        psi_i = pow(psi, -1, p)
        w1i, w2i = pow(w1, -1, p), pow(w2, -1, p)
        wi = pow(w, -1, p)
        n_inv = pow(n, -1, p)
        i1 = np.arange(n1)
        i2 = np.arange(N2)

        def pows(base, exps, p=p):
            return np.array(
                [pow(base, int(e) % (p - 1), p)
                 for e in np.asarray(exps).reshape(-1)],
                dtype=np.int64).reshape(np.shape(exps))

        # fwd stage-1: A1[i1, k1] = psi^(i1*n2) * w1^(i1*k1)
        a1 = pows(w1, np.multiply.outer(i1, i1)) \
            * pows(psi, i1 * N2)[:, None] % p
        # fwd twiddle [k1, i2]: psi^i2 * w^(i2*k1)
        twf = pows(psi, i2)[None, :] * pows(w, np.multiply.outer(i1, i2)) % p
        # fwd stage-2 (shared over k1): A2[i2, k2] = w2^(i2*k2)
        a2 = pows(w2, np.multiply.outer(i2, i2))
        # inv stage-1 (shared): B2[k2, i2] = w2^(-k2*i2)
        b2 = pows(w2i, np.multiply.outer(i2, i2))
        # inv twiddle [k1, i2]: psi^-i2 * w^(-i2*k1) / N
        twi = (pows(psi_i, i2) * n_inv % p)[None, :] \
            * pows(wi, np.multiply.outer(i1, i2)) % p
        # inv stage-2: B1[k1, i1] = w1^(-k1*i1) * psi^(-i1*n2)
        b1 = pows(w1i, np.multiply.outer(i1, i1)) \
            * pows(psi_i, i1 * N2)[None, :] % p

        # the inverse-final table folds the Garner constant M_i^{-1} mod p
        # (M_i = prod(primes)/p): the kernel's inverse emits
        # c'_i = z * M_i^{-1} mod p directly, and _garner_prefolded skips
        # the per-element Shoup multiply that used to compute it
        m_i = math.prod(primes) // p
        minv = pow(m_i % p, -1, p)
        b1m = b1 * minv % p
        # in_limbs=4: the data side feeds LAZY u32 residues as 4 BIASED
        # bytes (l_a = byte_a - 128 via the ^0x80 trick, _limbs4_biased) —
        # no carry chain, no centering, no fifth row.  The +128 bias adds
        # C4 * colsum(mat) per output, corrected below.
        w1f.append(_grouped(_premult_planes_lhs(a1, p, dl)))
        dft2.append(_premult_planes_limbs(a2, p, 4))
        idft2.append(_premult_planes_limbs(b2, p, 4))
        v1i.append(_grouped(_premult_planes_lhs(b1m, p, 4)))
        e = (1 << 32) % p
        assert e < (1 << 22), (p, e)      # special form: cheap reduction
        # (_combine_special needs e>>16 < 2^6 so hi*e splits into two
        # exact u32 products)
        e_consts.append(e)
        off = ((1 << 31) + (1 << 47)) % p
        off_mods.append(off)
        # biased-limb corrections: desired = computed + C * colsum(mat)
        # (mod p); C4 for 4-byte-biased u32 splits, C_dl for digit splits
        # (dl-1 biased bytes + one plain top limb)
        c4 = 128 * sum(1 << (8 * a) for a in range(4)) % p
        c_dl = 128 * sum(1 << (8 * a) for a in range(dl - 1)) % p
        corr1 = c_dl * (np.sum(a1, axis=0) % p) % p      # (n1,) per k1
        corr2i = c4 * (np.sum(b2, axis=0) % p) % p       # (N2,) per i2
        dft2_off.append(((off - c4 * (np.sum(a2, axis=0) % p)) % p)
                        .astype(np.uint32)[None, :])     # (1, N2) per k2
        # per-i1-row offset, broadcast along lanes host-side: a lane-dim-1
        # VMEM block is not lowerable in Mosaic (NOTES.md)
        v1i_off.append(np.ascontiguousarray(np.broadcast_to(
            ((off - c4 * (np.sum(b1m, axis=0) % p)) % p)
            .astype(np.uint32)[:, None], (n1, N2))))     # (n1, N2) per i1
        for dst, tw, corr in (
                ((twfv, twfs, twf16v, twf16s, twfb), twf, corr1[:, None]),
                ((twiv, twis, twi16v, twi16s, twib), twi, corr2i[None, :])):
            v, s = _shoup_pair(tw, p)
            v16, s16 = _shoup_pair(tw * pow(2, 16, p) % p, p)
            dst[0].append(v)
            dst[1].append(s)
            dst[2].append(v16)
            dst[3].append(s16)
            dst[4].append((tw * ((off - corr) % p) % p).astype(np.uint32))
    # The first call commonly happens INSIDE a jit trace (pbs_batch ->
    # blind_rotate_fused).  jnp.asarray there would return trace-bound
    # tracers; caching those crashes every later trace with
    # UnexpectedTracerError (round-4 red: test_norm2_cut_end_to_end, the
    # MULTI bench row).  ensure_compile_time_eval makes these concrete
    # device arrays regardless of the tracing context, so the lru_cache
    # entry is safe to close over from any number of jits.
    with jax.ensure_compile_time_eval():
        return FusedTables(
            primes=tuple(primes), e_consts=tuple(e_consts),
            off_mods=tuple(off_mods), n1=n1, dl=dl,
            w1f=jnp.asarray(np.stack(w1f)),
            dft2=jnp.asarray(np.stack(dft2)),
            dft2_off=jnp.asarray(np.stack(dft2_off)),
            v1i_off=jnp.asarray(np.stack(v1i_off)),
            idft2=jnp.asarray(np.stack(idft2)),
            v1i=jnp.asarray(np.stack(v1i)),
            twf_val=jnp.asarray(np.stack(twfv)),
            twf_sh=jnp.asarray(np.stack(twfs)),
            twi_val=jnp.asarray(np.stack(twiv)),
            twi_sh=jnp.asarray(np.stack(twis)),
            twf16_val=jnp.asarray(np.stack(twf16v)),
            twf16_sh=jnp.asarray(np.stack(twf16s)),
            twf_bias=jnp.asarray(np.stack(twfb)),
            twi16_val=jnp.asarray(np.stack(twi16v)),
            twi16_sh=jnp.asarray(np.stack(twi16s)),
            twi_bias=jnp.asarray(np.stack(twib)))


# ---------------------------------------------------------------------------
# BSK packing
# ---------------------------------------------------------------------------

@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["spec_val", "spec_sh"],
                   meta_fields=["primes", "trunc_bits", "base_log", "levels"])
@dataclasses.dataclass(frozen=True)
class FusedBSK:
    """BSK pre-transformed per CRT prime for the fused step kernel.

    spec_val/spec_sh: (n, P * Cin * (k+1), N) u32 — plain NTT residues of
    the centered, t-bit-truncated BSK polynomials (four-step [k1-major]
    layout) and their Shoup companions, flattened so one step's slice is a
    single 3D block; row index = (pr * Cin + ci) * (k+1) + co.
    """
    spec_val: jnp.ndarray
    spec_sh: jnp.ndarray
    primes: tuple
    trunc_bits: int
    base_log: int
    levels: int

    @property
    def n_small(self) -> int:
        return self.spec_val.shape[0]


def _plan_perm(n: int, n1: int) -> np.ndarray:
    """four-step flat index k1*n2 + k2 holds natural frequency k2*n1 + k1."""
    n2 = n // n1
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    return (k2 * n1 + k1).reshape(-1)


def pack_bsk_fused(bsk_u64: np.ndarray, params: CryptoParams,
                   message_bits: int = None, norm2: int = 1,
                   primes: tuple = None, trunc_bits: int = None) -> FusedBSK:
    """Truncate + pre-transform a u64 BSK (n, l, k+1, k+1, N) per CRT prime
    (host side).  The truncation is part of the key: the plaintext oracle
    for bit-exactness tests is refimpl on truncate_bsk_u64(bsk, t)."""
    if primes is None or trunc_bits is None:
        primes, trunc_bits = choose_fused_primes(params, message_bits, norm2)
    bsk_u64 = np.asarray(bsk_u64, dtype=np.uint64)
    n_small, l, kp1, _, n = bsk_u64.shape
    n1 = n // N2
    cin = l * kp1
    flat = bsk_u64.reshape(n_small, cin, kp1, n)
    # centered, truncated, divided by 2^t: |b'| <= 2^(63-t)
    signed = truncate_bsk_u64(flat, trunc_bits).astype(np.int64)
    signed >>= np.int64(trunc_bits)
    perm = _plan_perm(n, n1)
    vals = np.empty((n_small, len(primes) * cin * kp1, n), dtype=np.uint32)
    shs = np.empty_like(vals)
    for pi, p in enumerate(primes):
        nat = ntt_host.ntt_forward(signed % p, n, p)
        four = nat[..., perm]                       # (n_small, cin, kp1, N)
        v, s = _shoup_pair(four, p)
        rows = slice(pi * cin * kp1, (pi + 1) * cin * kp1)
        vals[:, rows] = v.reshape(n_small, cin * kp1, n)
        shs[:, rows] = s.reshape(n_small, cin * kp1, n)
    return FusedBSK(spec_val=jnp.asarray(vals), spec_sh=jnp.asarray(shs),
                    primes=tuple(primes), trunc_bits=int(trunc_bits),
                    base_log=params.pbs_base_log, levels=params.pbs_level)


# ---------------------------------------------------------------------------
# In-kernel arithmetic
# ---------------------------------------------------------------------------

def _shoup_mul_const(a, c_val: int, c_sh: int, p: int):
    """a (u32 < p... any) * constant c (< p, Shoup pair) mod p."""
    hi, _lo = _mul_pair(a, U32(c_sh))
    r = a * U32(c_val) - hi * U32(p)
    return r - U32(p) * (~_lt_u32(r, U32(p))).astype(U32)


@functools.lru_cache(maxsize=None)
def _garner_shift_tables(primes: tuple, shift: int):
    """Constants for the explicit-CRT shifted reconstruction (see
    _garner_shifted): Shoup pairs of M_i^{-1} mod p_i, H mod p_i, and the
    64-bit images of M_i, P, H premultiplied by 2^shift."""
    p_prod = math.prod(primes)
    h_half = (p_prod - 1) // 2
    inv, m64, hinv_mod = [], [], []
    for p in primes:
        assert (1 << 31) - p < (1 << 24), \
            "exact-k estimate needs primes within 2^24 of 2^31"
        m_i = p_prod // p
        v = pow(m_i % p, -1, p)
        inv.append((v, (v << 32) // p))
        m64.append(_u64_pair((m_i << shift) % (1 << 64)))
        hinv_mod.append(int(h_half * v % p))
    p64 = _u64_pair((p_prod << shift) % (1 << 64))
    h64 = _u64_pair((h_half << shift) % (1 << 64))
    return tuple(inv), tuple(hinv_mod), tuple(m64), p64, h64


def _u64_pair(v: int):
    return int((v >> 32) % (1 << 32)), int(v % (1 << 32))


def _garner_shifted(primes: tuple, res_vals, shift: int):
    """Exact (z << shift) mod 2^64 from per-prime residues of the signed
    external product z, as a (hi, lo) u32 pair — the round-4 rewrite of
    pallas_ntt._garner_value (+ the separate truncation-shift block):

      w = z + H reconstructed explicitly: w = sum_i c_i M_i - k P with
      c_i = (r_i + H) M_i^{-1} mod p_i, M_i = P / p_i, H = (P-1)/2;
      z << shift = (sum c_i (M_i << s) - k (P << s) - (H << s)) mod 2^64.

    k = floor(sum c_i / p_i) < n_p is recovered EXACTLY by the 6-op
    estimate (sum_i c_i >> 3) >> 28: the primes are 2^31 - a_i with
    a_i < 2^24 (asserted) so the estimate errs by < n_p * (2^-7 + 2^-28),
    while any configuration accepted by choose_fused_primes has
    |z| <= P/4 (required_bits' +2 guard), keeping sum c_i / p_i at least
    ~1/4 away from every integer.  Versus the mixed-radix digit chain: no serial
    digit dependencies (the three c_i chains are independent ILP), no
    magnitude-compare cascade for sign centering, and the truncation
    shift costs nothing (folded into the constants).
    """
    inv, hinv_mod, m64, p64, h64 = _garner_shift_tables(primes, shift)
    cs = []
    for i, p in enumerate(primes):
        # c_i = (r_i + H) * inv = r_i * inv + (H * inv mod p): the Shoup
        # multiply accepts the combine's LAZY (non-canonical) residues,
        # so no canonicalization pass is needed anywhere
        t = _shoup_mul_const(res_vals[i], inv[i][0], inv[i][1], p)
        s = t + U32(hinv_mod[i])
        cs.append(s - U32(p) * (~_lt_u32(s, U32(p))).astype(U32))
    k = cs[0] >> U32(3)
    for c in cs[1:]:
        k = k + (c >> U32(3))
    k = k >> U32(28)
    lo = jnp.zeros_like(res_vals[0])
    hi = jnp.zeros_like(res_vals[0])
    for i in range(len(primes)):
        mh_c, ml_c = m64[i]
        mh, ml = _mul_pair(cs[i], U32(ml_c))
        mh = mh + cs[i] * U32(mh_c)
        nlo = lo + ml
        hi = hi + mh + _lt_u32(nlo, ml).astype(U32)
        lo = nlo
    kp_hi, kp_lo = _mul_pair(k, U32(p64[1]))
    kp_hi = kp_hi + k * U32(p64[0])
    t = lo - kp_lo
    hi = hi - kp_hi - _lt_u32(lo, t).astype(U32)
    lo = t
    t = lo - U32(h64[1])
    hi = hi - U32(h64[0]) - _lt_u32(lo, t).astype(U32)
    return hi, t


def _garner_prefolded(primes: tuple, c_vals, shift: int,
                      skip_h: bool = False):
    """_garner_shifted for inverse outputs that already carry the
    M_i^{-1} factor (folded into the v1i tables by build_fused_tables):
    c_vals[i] is a LAZY u32 ≡ z * M_i^{-1} (mod p_i).

    Lazy c_i are admissible throughout: M_i = P / p_i exactly, so
    sum_i c_i M_i = P * sum_i (c_i / p_i) for ANY integer representatives
    c_i, and w = z + H = P * frac(sum c_i / p_i) regardless of which
    representative each c_i is — extra multiples of p_i shift the sum by
    integers, which floor(k) absorbs.  The 6-op k-estimate stays exact:
    c_i < 2^32 keeps its truncation error < 3 * 2^-6 + 2^-24, and the
    |z| <= P/4 guard keeps frac(sum) at least 1/4 from every integer.
    Per element: one conditional subtraction + one add per prime replaces
    the former Shoup multiply + two canonicalizations (~19 ops saved per
    prime per element; the Garner chain was the largest single VPU block
    in the round-4 ablations).
    """
    inv, hinv_mod, m64, p64, h64 = _garner_shift_tables(primes, shift)
    cs = []
    for i, p in enumerate(primes):
        # one condsub brings c' under ~p + 2^22, so + (H M_i^{-1} mod p)
        # cannot wrap u32 (c_i stays the TRUE integer, merely lazy)
        t = c_vals[i]
        t = t - U32(p) * (~_lt_u32(t, U32(p))).astype(U32)
        cs.append(t + U32(hinv_mod[i]))
    k = cs[0] >> U32(3)
    for c in cs[1:]:
        k = k + (c >> U32(3))
    k = k >> U32(28)
    lo = jnp.zeros_like(c_vals[0])
    hi = jnp.zeros_like(c_vals[0])
    for i in range(len(primes)):
        mh_c, ml_c = m64[i]
        mh, ml = _mul_pair(cs[i], U32(ml_c))
        mh = mh + cs[i] * U32(mh_c)
        nlo = lo + ml
        hi = hi + mh + _lt_u32(nlo, ml).astype(U32)
        lo = nlo
    kp_hi, kp_lo = _mul_pair(k, U32(p64[1]))
    kp_hi = kp_hi + k * U32(p64[0])
    t = lo - kp_lo
    hi = hi - kp_hi - _lt_u32(lo, t).astype(U32)
    lo = t
    if skip_h:
        # hi-only accumulator mode: emit top32(((z+H) << s) mod 2^64) -
        # top32(H << s); only the BORROW of the low-word H subtraction is
        # dropped — a deterministic, oracle-mirrored <= n_small * 2^32
        # accumulator perturbation, >= 2^13 below every noise term.  (The
        # H correction must happen per step: a constant accumulator
        # offset does NOT commute with the negacyclic rotation — the
        # wraparound sign flips would leak it into the digits.)
        return hi - U32(h64[0])
    t = lo - U32(h64[1])
    hi = hi - U32(h64[0]) - _lt_u32(lo, t).astype(U32)
    return hi, t


def _shoup_mul(a, b_val, b_sh, p: int, lazy: bool = False):
    """a (any u32) * b (plain, < p, with Shoup companion) mod p -> [0, p),
    or [0, 2p) when lazy (the conditional subtraction dropped — for
    consumers that are mod-p linear in the represented integer: limb
    matmuls, centering, lazy adds).

    q = hi32(a * b_sh) with b_sh = floor(b * 2^32 / p) satisfies
    q in {Q, Q-1} for Q = floor(a*b/p), so r = a*b - q*p (mod 2^32) is the
    exact remainder up to one conditional subtraction [Shoup/Harvey].
    ~18 VPU ops vs ~30 for a Montgomery multiply.
    """
    hi, _lo = _mul_pair(a, b_sh)
    r = a * b_val - hi * U32(p)
    if lazy:
        return r
    return r - U32(p) * (~_lt_u32(r, U32(p))).astype(U32)


def _add_mod_p(a, b, p: int):
    s = a + b
    return s - U32(p) * (~_lt_u32(s, U32(p))).astype(U32)


def _add_lazy(a, b, e: int):
    """Lazy mod-p add of u32 residues (any magnitude): a u32 wraparound
    loses 2^32 ≡ e (mod p), so compensate the carry with +e.  The
    compensated sum cannot re-wrap (sum < 2^32 after wrap, e < 2^22)."""
    s = a + b
    return s + _lt_u32(s, b).astype(U32) * U32(e)


def _limbs4_parts_biased(x_u32):
    """LAZY u32 residue (any u32 ≡ v mod p) -> 4 int8 biased-byte limbs:
    l_a = byte_a ^ 0x80 read as two's complement (value byte_a - 128), so
    x = sum_a (l_a + 128) * 2^(8a) EXACTLY for every u32 — no carry
    chain, no sign row, no centering.  The constant +128 bias contributes
    C4 * colsum(mat) per matmul output, which the table builder folds
    into the pair-twiddle bias tables / combine offset vectors.  2-3 VPU
    ops per limb vs ~6 for the balanced-carry split, and one fewer limb
    row than the former 5-row lazy split (-20% stage-2/v1i MACs)."""
    xi = jax.lax.bitcast_convert_type(x_u32, I32)
    outs = []
    for a in range(4):
        b = (xi >> I32(8 * a)) & I32(0xFF) if a else xi & I32(0xFF)
        outs.append((b ^ I32(0x80)).astype(jnp.int8))
    return outs


def _limbs4_biased(x_u32):
    """(M, K) lazy u32 -> (M, 4*K) int8, limb-major along lanes."""
    return jnp.concatenate(_limbs4_parts_biased(x_u32), axis=-1)


def _limbs_rows4_biased(x3_u32):
    """(m, R, L) lazy u32 -> (m, 4*R, L) int8, limb-major along sublanes
    (the table-as-LHS rhs layout)."""
    return jnp.concatenate(_limbs4_parts_biased(x3_u32), axis=1)


def _limb_parts_digits_biased(x_i32, dl: int):
    """Signed digit i32 (|d| <= 2^(8*dl-7), the digit_limbs guarantee) ->
    dl int8 limbs: dl-1 biased bytes + a plain arithmetic-shift top limb
    (|top| <= 64 always fits int8).  x = sum_{a<dl-1} (l_a + 128)*2^(8a)
    + l_top * 2^(8(dl-1)); the bias contributes C_dl * colsum(mat),
    corrected by the builder."""
    outs = []
    for a in range(dl - 1):
        b = (x_i32 >> I32(8 * a)) & I32(0xFF) if a else x_i32 & I32(0xFF)
        outs.append((b ^ I32(0x80)).astype(jnp.int8))
    outs.append((x_i32 >> I32(8 * (dl - 1))).astype(jnp.int8)
                if dl > 1 else x_i32.astype(jnp.int8))
    return outs


def _limbs_i32(x, dl: int):
    """Biased limb split of 2D i32 digits -> (M, dl*K) int8, limb-major
    along lanes."""
    outs = _limb_parts_digits_biased(x, dl)
    if dl == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=-1)


def _combine_special(planes, p: int, e: int, off: int):
    """Plane-major int32 planes (M, 4*L) -> LAZY u32 residues (M, L)
    (lane-sliced layout, for the data-as-LHS stage-2 matmuls whose L is
    the full 128-lane width)."""
    l_dim = planes.shape[-1] // 4
    g0 = planes[:, :l_dim] + (planes[:, l_dim:2 * l_dim] << I32(8))
    g1 = planes[:, 2 * l_dim:3 * l_dim] \
        + (planes[:, 3 * l_dim:] << I32(8))
    return _combine_pair(g0, g1, p, e, off)


def _combine_rows3(planes3, p: int, e: int, off: int):
    """Plane-major-along-ROWS int32 planes (m, 4*R, L) -> LAZY u32
    residues (m, R, L) (for the table-as-LHS matmuls: plane slices are
    sublane-aligned row ranges — no lane shuffles at any L)."""
    r = planes3.shape[1] // 4
    g0 = planes3[:, :r, :] + (planes3[:, r:2 * r, :] << I32(8))
    g1 = planes3[:, 2 * r:3 * r, :] + (planes3[:, 3 * r:, :] << I32(8))
    return _combine_pair(g0, g1, p, e, off)


def _combine_pair(g0, g1, p: int, e: int, off: int):
    """g0 = P0 + 2^8 P1, g1 = P2 + 2^8 P3 -> LAZY u32 ≡ v (mod p) for
    v = P0 + 2^8 P1 + 2^16 P2 + 2^24 P3: the returned u32 represents v
    but is NOT canonicalized — downstream Shoup multiplies and limb
    matmuls are mod-p linear in the represented integer, so no consumer
    pays for a canonicalization pass.

    The pair (g0, g1) is formed as an exact u32 pair with a 2^31 + 2^47
    bias (the builders assert the i32 plane-pair packing is exact), then
    reduced with the special-prime identity 2^32 ≡ e (mod p) for
    e < 2^22: three cheap u32 multiplies instead of Montgomery REDC's
    seven (the round-4 hot-spot fix: the REDC-based combine was 45% of
    the fused step).
    """
    u0 = jax.lax.bitcast_convert_type(g0, U32) ^ U32(1 << 31)  # g0 + 2^31
    u1 = jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
    lo = u0 + _shl16(u1)
    c = _lt_u32(lo, u0).astype(U32)
    hi = _shr16(u1) + c              # pair = true + 2^31 + 2^47, hi < 2^16
    # hi * e as an exact pair (e = e1*2^16 + e0, e < 2^21 -> e1 < 2^5)
    e0, e1 = e & 0xFFFF, e >> 16
    t0 = hi * U32(e0)                              # < 2^32
    t1 = hi * U32(e1)                              # < 2^21
    lo2 = t0 + _shl16(t1)
    c2 = _lt_u32(lo2, t0).astype(U32)
    h2 = _shr16(t1) + c2                           # < 2^6
    s = lo + lo2
    h = h2 + _lt_u32(s, lo).astype(U32)            # residual high < 2^7
    r = s + h * U32(e)                             # h*e < 2^28
    r = r + _lt_u32(r, s).astype(U32) * U32(e)     # wrap ≡ +e (once; the
    # second wrap would need r > 2^32 - 2^21 after adding < 2^21 — the
    # compensated sum is < 2^21 + 2^21, far below another wrap)
    # subtract the packing bias: off = (2^31 + 2^47) mod p, possibly a
    # per-lane/per-row u32 vector folding in the biased-limb correction
    off_v = off if isinstance(off, jnp.ndarray) else U32(off)
    out = r - off_v
    return out - _lt_u32(r, off_v).astype(U32) * U32(e)


def _mm_combine(x_i8, w_i8, p: int, e: int, off: int):
    """(M, L*K) i8 @ premult planes (L*K, 4*L2) -> (M, L2) u32 LAZY
    residues (MXU matmul + special-prime plane combine)."""
    planes = jax.lax.dot_general(
        x_i8, w_i8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if "combine" in _ABLATE:
        l2 = planes.shape[-1] // 4
        return jax.lax.bitcast_convert_type(planes[..., :l2], U32)
    return _combine_special(planes, p, e, off)


def _mm_pair(x_i8, w_i8):
    """(M, L*K) i8 @ premult planes (L*K, 4*L2) -> the i32 plane pair
    (g0, g1) of shape (M, L2) each, for consumers that absorb the pair
    directly (_pair_twiddle)."""
    planes = jax.lax.dot_general(
        x_i8, w_i8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    l2 = planes.shape[-1] // 4
    g0 = planes[:, :l2] + (planes[:, l2:2 * l2] << I32(8))
    g1 = planes[:, 2 * l2:3 * l2] + (planes[:, 3 * l2:] << I32(8))
    return g0, g1


def _pair_twiddle(g0, g1, twv, tws, tw16v, tw16s, bias, p: int, e: int):
    """tw * (g0 + 2^16*g1) mod p -> LAZY u32, consuming the plane pair
    directly: with u_j = bitcast(g_j) ^ 2^31 = g_j + 2^31 exactly,

      tw*v = tw*u0 + (tw*2^16)*u1 - tw*(2^31 + 2^47)  (mod p)

    i.e. two lazy Shoup multiplies + a lazy add + a lazy subtract of the
    precomputed bias column — cheaper than a full pair reduction
    (_combine_pair, ~40 VPU ops) followed by a Shoup twiddle."""
    u0 = jax.lax.bitcast_convert_type(g0, U32) ^ U32(1 << 31)
    u1 = jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
    s = _add_lazy(_shoup_mul(u0, twv, tws, p, lazy=True),
                  _shoup_mul(u1, tw16v, tw16s, p, lazy=True), e)
    r = s - bias
    # a u32 wrap in the subtract loses 2^32 ≡ e; r after a wrap is
    # >= 2^32 - bias > 2^31 > e, so the compensation cannot re-wrap
    return r - U32(e) * _lt_u32(s, bias).astype(U32)


def _limbs_rows3(x3, dl: int):
    """Biased limb split of 3D i32 digits (m, R, L) -> (m, dl*R, L) int8,
    limb-major along SUBLANES (axis 1): the rhs layout for the
    table-as-LHS matmuls.  Sublane concatenation is free vreg stacking —
    no relayout, unlike inserting an int8 minor dim."""
    if dl == 1:
        return x3.astype(jnp.int8)
    return jnp.concatenate(_limb_parts_digits_biased(x3, dl), axis=1)


def _limbs_rows3_abl(x3, dl: int):
    if "limbs" in _ABLATE:
        x8 = x3.astype(jnp.int8)
        return x8 if dl == 1 else jnp.concatenate([x8] * dl, axis=1)
    return _limbs_rows3(x3, dl)


def _mm_combine_lhs(w_i8, xl3, p: int, e: int, off: int):
    """Table-as-LHS transform: W @ each batch slab of
    xl3 (m, dl*R_in, L) i8 -> (m, R_out, L) u32 LAZY residues.

    W is (g*4*R_out, g*dl*R_in) — the base table, or its g-way
    block-diagonal expansion (build_fused_tables group=g): one MXU op
    then covers g batch slabs (their limb rows merge along sublanes for
    free), trading g x the stage MACs (stage 1 + inverse-final are ~18%
    of the step's MACs at g=1) for g x fewer small-matmul issues.  The
    plane combine runs per group on the (g, 4*R_out, L) view with
    sublane-aligned row slices, so live int32 planes stay one group
    deep (~64-256 KB) instead of all m (~8 MB at r_blk=8)."""
    m = xl3.shape[0]
    dlk = xl3.shape[1]
    g = max(1, w_i8.shape[1] // dlk)
    if m % g:
        # fall back to the top-left base block when g doesn't divide m
        w_i8 = w_i8[:w_i8.shape[0] // g, :dlk]
        g = 1
    outs = []
    for base in range(0, m, g):
        rhs = xl3[base] if g == 1 else \
            xl3[base:base + g].reshape(g * dlk, xl3.shape[2])
        planes = jax.lax.dot_general(
            w_i8, rhs,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        p3 = planes.reshape(g, planes.shape[0] // g, planes.shape[1])
        if "combine" in _ABLATE:
            r = p3.shape[1] // 4
            outs.append(jax.lax.bitcast_convert_type(p3[:, :r, :], U32))
        else:
            outs.append(_combine_rows3(p3, p, e, off))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _mm_pair_lhs(w_i8, xl3):
    """_mm_combine_lhs emitting the i32 plane pair (g0, g1), each
    (m, R_out, L), instead of reducing — for _pair_twiddle consumers."""
    m = xl3.shape[0]
    dlk = xl3.shape[1]
    g = max(1, w_i8.shape[1] // dlk)
    if m % g:
        w_i8 = w_i8[:w_i8.shape[0] // g, :dlk]
        g = 1
    g0s, g1s = [], []
    for base in range(0, m, g):
        rhs = xl3[base] if g == 1 else \
            xl3[base:base + g].reshape(g * dlk, xl3.shape[2])
        planes = jax.lax.dot_general(
            w_i8, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        p3 = planes.reshape(g, planes.shape[0] // g, planes.shape[1])
        r = p3.shape[1] // 4
        g0s.append(p3[:, :r, :] + (p3[:, r:2 * r, :] << I32(8)))
        g1s.append(p3[:, 2 * r:3 * r, :] + (p3[:, 3 * r:, :] << I32(8)))
    cat = (lambda xs: jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0])
    return cat(g0s), cat(g1s)


# ---------------------------------------------------------------------------
# The fused step kernel
# ---------------------------------------------------------------------------

def _limbs4_abl(x_u32):
    """_limbs4_biased, or a shape-correct cheap stand-in under the 'limbs'
    ablation (results wrong).  NOTE on the retired centering pass: lazy
    u32 residues must NOT go through pallas_ntt._center_residues — for
    x >= 2^31 its i32 bitcast shifts the represented integer by
    -2^32 ≡ -e (mod p); the biased byte split handles any u32 exactly
    instead."""
    if "limbs" in _ABLATE:
        x8 = x_u32.astype(jnp.int8)
        return jnp.concatenate([x8] * 4, axis=-1)
    return _limbs4_biased(x_u32)


def _limbs_rows4_abl(x3_u32):
    if "limbs" in _ABLATE:
        x8 = x3_u32.astype(jnp.int8)
        return jnp.concatenate([x8] * 4, axis=1)
    return _limbs_rows4_biased(x3_u32)


def _fwd_rows(xl3, pr: int, tabs: FusedTables, w1f, dft2, dft2_off,
              twv, tws, tw16v, tw16s, twb):
    """Digit-limb rows xl3 (M, dl*n1, N2) i8 (natural coefficient order,
    limbs along sublanes — hoisted out of the prime loop: they are
    prime-independent) -> (M, N) u32 four-step spectrum, one prime.
    Transpose-free: stage 1 is the table-as-LHS matmul y_m = A1^T @ x_m,
    consuming the natural [i1-rows, i2-lanes] view directly and emitting
    [k1-rows, i2-lanes] for the pair-twiddle + stage 2."""
    p = tabs.primes[pr]
    e = tabs.e_consts[pr]
    off = tabs.off_mods[pr]
    n1 = tabs.n1
    m = xl3.shape[0]
    if "twiddle" in _ABLATE or "combine" in _ABLATE:
        y = _mm_combine_lhs(w1f[pr], xl3, p, e, off)    # (m, n1, n2) [k1,i2]
    else:
        g0, g1 = _mm_pair_lhs(w1f[pr], xl3)
        y = _pair_twiddle(g0, g1, twv[pr], tws[pr], tw16v[pr], tw16s[pr],
                          twb[pr], p, e)
    z8 = _limbs4_abl(y.reshape(m * n1, N2))
    out = _mm_combine(z8, dft2[pr], p, e, dft2_off[pr])  # (m*n1,n2) [k1,k2]
    return out.reshape(m, n1 * N2)


def _inv_rows(x_u32, pr: int, tabs: FusedTables, idft2, v1i, v1i_off,
              twv, tws, tw16v, tw16s, twb):
    """(M, N) u32 four-step spectrum -> (M, N) u32 coefficient residues
    (natural order; the v1i tables fold M_i^{-1}, see build_fused_tables).
    Transpose-free: the final stage is the table-as-LHS matmul
    res_m = B1^T @ u_m, emitting [i1-rows, i2-lanes] = the natural
    coefficient layout."""
    p = tabs.primes[pr]
    e = tabs.e_consts[pr]
    off = tabs.off_mods[pr]
    n1 = tabs.n1
    m = x_u32.shape[0]
    z8 = _limbs4_abl(x_u32.reshape(m * n1, N2))
    if "twiddle" in _ABLATE or "combine" in _ABLATE:
        u = _mm_combine(z8, idft2[pr], p, e, off)       # (m*n1, n2) [k1,i2]
        u = u.reshape(m, n1, N2)
    else:
        g0, g1 = _mm_pair(z8, idft2[pr])
        u = _pair_twiddle(g0.reshape(m, n1, N2), g1.reshape(m, n1, N2),
                          twv[pr], tws[pr], tw16v[pr], tw16s[pr],
                          twb[pr], p, e)
    ul3 = _limbs_rows4_abl(u)
    w = _mm_combine_lhs(v1i[pr], ul3, p, e, v1i_off[pr])  # (m,n1,n2) [i1,i2]
    return w.reshape(m, n1 * N2)


def _step_kernel(a_ref, *refs,
                 tabs: FusedTables, n: int, base_log: int, levels: int,
                 kp1: int, r_blk: int, trunc_bits: int, acc32: bool):
    from concrete_tpu.ops import pallas_step as ps
    if acc32:
        (acc0_hi_ref, sv_ref, ss_ref,
         w1f_ref, dft2_ref, dft2_off_ref, idft2_ref, v1i_ref,
         v1i_off_ref,
         twfv_ref, twfs_ref, twiv_ref, twis_ref,
         twf16v_ref, twf16s_ref, twfb_ref,
         twi16v_ref, twi16s_ref, twib_ref,
         out_hi_ref) = refs
    else:
        (acc0_lo_ref, acc0_hi_ref, sv_ref, ss_ref,
         w1f_ref, dft2_ref, dft2_off_ref, idft2_ref, v1i_ref,
         v1i_off_ref,
         twfv_ref, twfs_ref, twiv_ref, twis_ref,
         twf16v_ref, twf16s_ref, twfb_ref,
         twi16v_ref, twi16s_ref, twib_ref,
         out_lo_ref, out_hi_ref) = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        if not acc32:
            out_lo_ref[...] = acc0_lo_ref[...]
        out_hi_ref[...] = acc0_hi_ref[...]

    primes = tabs.primes
    n_p = len(primes)
    cin = levels * kp1
    # COMPONENT-MAJOR layout throughout (round 4, session 2): accumulator
    # blocks are (kp1, r_blk, n), so digit rows, pointwise inputs
    # dhat[lev, comp], the co-major inverse stack, the Garner output and
    # the accumulator update are ALL contiguous row ranges — the former
    # (r_blk, kp1, n) layout paid a strided sublane gather per pointwise
    # slice and per accumulator component write.
    acc_hi = out_hi_ref[...].reshape(kp1 * r_blk, n)
    acc_lo = None if acc32 else out_lo_ref[...].reshape(kp1 * r_blk, n)
    # step-j rotation amounts: the a block carries the full per-row step
    # vector (blocks with a lane dim of 1 are not lowerable); select
    # column j by mask-reduce — negligible next to the transforms
    a_all = a_ref[...]                                   # (R, n_small) i32
    lane = jax.lax.broadcasted_iota(jnp.int32, a_all.shape, 1)
    sel = jnp.where(lane == jnp.int32(j), a_all, jnp.zeros_like(a_all))
    # dtype pinned: x64-mode jnp.sum would promote i32 -> i64 (unsupported
    # in Mosaic)
    a = jnp.sum(sel, axis=1, keepdims=True, dtype=jnp.int32)
    a_rows = jnp.broadcast_to(a[None, :, :], (kp1, r_blk, 1)) \
        .reshape(kp1 * r_blk, 1)
    if "rotate" in _ABLATE:
        digs = [jax.lax.bitcast_convert_type(
            acc_hi >> U32(10), I32)] * levels
    elif acc32:
        digs = ps.rotate_diff_digits_hi(acc_hi, a_rows, n=n,
                                        base_log=base_log, levels=levels)
    else:
        digs = ps.rotate_diff_digits(acc_lo, acc_hi, a_rows, n=n,
                                     base_log=base_log, levels=levels)

    # rows (lev, comp, r); digit limbs are prime-independent — hoisted
    digs_all = digs[0] if levels == 1 else jnp.concatenate(digs, axis=0)
    m_f = levels * kp1 * r_blk
    xl3 = _limbs_rows3_abl(digs_all.reshape(m_f, tabs.n1, N2), tabs.dl)
    res = []
    for pr in range(n_p):
        p = primes[pr]
        e = tabs.e_consts[pr]
        if "fwd" in _ABLATE:
            dhat = jax.lax.bitcast_convert_type(digs_all, U32) \
                .reshape(levels, kp1, r_blk, n)
        else:
            # all gadget levels through one stacked forward transform:
            # fewer, larger VPU/MXU ops per prime
            dhat = _fwd_rows(xl3, pr, tabs, w1f_ref, dft2_ref,
                             dft2_off_ref, twfv_ref, twfs_ref,
                             twf16v_ref, twf16s_ref, twfb_ref) \
                .reshape(levels, kp1, r_blk, n)
        if "pointwise" in _ABLATE:
            prods = [dhat[0, co % kp1] for co in range(kp1)]
        else:
            prods = []
            for co in range(kp1):
                acc_f = None
                for lev in range(levels):
                    for comp in range(kp1):
                        ci = lev * kp1 + comp
                        row = (pr * cin + ci) * kp1 + co
                        t = _shoup_mul(dhat[lev, comp],
                                       sv_ref[0, row:row + 1, :],
                                       ss_ref[0, row:row + 1, :], p,
                                       lazy=True)
                        acc_f = t if acc_f is None \
                            else _add_lazy(acc_f, t, e)
                prods.append(acc_f)                      # (R, N) u32
        stacked = jnp.concatenate(prods, axis=0)         # (kp1*R, N) co-major
        if "inv" in _ABLATE:
            res.append(stacked)
        else:
            res.append(_inv_rows(stacked, pr, tabs, idft2_ref, v1i_ref,
                                 v1i_off_ref, twiv_ref, twis_ref,
                                 twi16v_ref, twi16s_ref, twib_ref))

    if acc32:
        if "garner" in _ABLATE:
            add_hi = res[0]
        else:
            add_hi = _garner_prefolded(primes, res, trunc_bits,
                                       skip_h=True)
        out_hi_ref[...] = out_hi_ref[...] + add_hi.reshape(kp1, r_blk, n)
        return
    if "garner" in _ABLATE:
        add_hi, add_lo = res[0], res[-1]
    else:
        # explicit-CRT reconstruction with the truncation shift folded
        # into the constants and the M_i^{-1} factor folded into the v1i
        # tables (res[i] ≡ z * M_i^{-1} mod p_i, lazy)
        add_hi, add_lo = _garner_prefolded(primes, res, trunc_bits)
    add_lo = add_lo.reshape(kp1, r_blk, n)
    add_hi = add_hi.reshape(kp1, r_blk, n)
    cur_lo = out_lo_ref[...]
    new_lo = cur_lo + add_lo
    carry = _lt_u32(new_lo, add_lo).astype(U32)
    out_lo_ref[...] = new_lo
    out_hi_ref[...] = out_hi_ref[...] + add_hi + carry


def _choose_row_block(b_ct: int, n: int, kp1: int, cin: int, n_p: int,
                      budget_bytes: int = 6 << 20) -> int:
    """Largest power-of-two batch-row block whose live VMEM estimate fits."""
    per_row = 4 * n * (4 * kp1 + 3 * cin + (n_p + 1) * kp1 + 10)
    r = 32
    while r > 1 and (r * per_row > budget_bytes or b_ct % r):
        r //= 2
    while b_ct % r:
        r //= 2
    return max(r, 1)


def acc32_eligible(bsk: FusedBSK) -> bool:
    """Hi-only accumulator mode for the fused scan: the gadget digits must
    read only the accumulator's high u32 word (levels*base_log <= 31).
    Unlike the banded path's exact hi-only mode, the fused Garner output
    has nonzero low bits (trunc shift < 32), so the mode truncates each
    step's update to its top word — a deterministic, oracle-mirrored
    perturbation bounded by (n_small + 2) * 2^32 per coefficient
    (relative std < 2^-20), >= 2^13 below the smallest message scale any
    fused parameter set carries (see blind_rotate_acc32_oracle)."""
    from concrete_tpu.ops import pallas_step as ps
    return (_os.environ.get("CONCRETE_TPU_ACC32", "1") == "1"
            and ps.digits_lo_free(bsk.base_log, bsk.levels))


def blind_rotate_acc32_oracle(lwe_ct, bsk_u64, lut_poly,
                              params: CryptoParams, primes: tuple,
                              trunc_bits: int):
    """Numpy oracle for the hi-only fused accumulator (single ciphertext).

    Mirrors the kernel's truncated arithmetic exactly: the accumulator is
    maintained as the top u32 word per coefficient; each step adds
    top32(((z + H) << t) mod 2^64) - top32(H << t) for the exact external
    product z of the balanced digits with the t-bit-truncated,
    down-shifted BSK (H = (prod(primes)-1)/2 — the Garner half-offset;
    only the low-word borrow of its subtraction is dropped).
    """
    from concrete_tpu.core import refimpl as ref
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    bl = params.pbs_base_log
    h_half = (math.prod(primes) - 1) // 2
    htop = (((h_half << trunc_bits) % (1 << 64)) >> 32) % (1 << 32)
    switched = ref.modulus_switch(np.asarray(lwe_ct, dtype=np.uint64),
                                  params.log2_polynomial_size)
    a_t, b_t = switched[:-1], int(switched[-1])
    # the kernel truncates the LUT to its top word BEFORE the b_t
    # rotation (exact for encode_expand outputs, whose low 32 bits are
    # zero; a deterministic <= 2^32 perturbation otherwise)
    lut_t = ((np.asarray(lut_poly, dtype=np.uint64) >> np.uint64(32))
             << np.uint64(32))
    acc0 = ref.glwe_trivial(ref.monomial_mul(lut_t, 2 * n - b_t), k)
    hi = (acc0 >> np.uint64(32)).astype(np.uint32)
    signed = truncate_bsk_u64(bsk_u64, trunc_bits).astype(np.int64)
    signed >>= np.int64(trunc_bits)
    b_sh = signed.astype(np.uint64)           # (n_small, l, k+1, k+1, N)
    h64 = np.uint64(h_half % (1 << 64))
    for i in range(params.n_small):
        v = hi.astype(np.uint64) << np.uint64(32)        # (k+1, N)
        rot = np.stack([ref.monomial_mul(v[c], int(a_t[i]))
                        for c in range(k + 1)])
        diff = rot - v
        digs = ref.decompose(diff, bl, l)                # (k+1, N, l)
        zmod = np.zeros((k + 1, n), dtype=np.uint64)
        for lev in range(l):
            for comp in range(k + 1):
                d_u = digs[comp, :, lev].astype(np.uint64)
                for co in range(k + 1):
                    zmod[co] += ref.negacyclic_polymul(
                        d_u, b_sh[i, lev, comp, co])
        w = (zmod + h64) << np.uint64(trunc_bits)
        hi = hi + (w >> np.uint64(32)).astype(np.uint32) \
            - np.uint32(htop)
    return hi.astype(np.uint64) << np.uint64(32)


def blind_rotate_fused(ct_small, bsk: FusedBSK, lut_poly,
                       params: CryptoParams, row_block: int = None,
                       interpret: bool = None, acc32: bool = None):
    """Batched blind rotation, entire scan in ONE pallas_call.

    (B, n+1) u64 + (N,) LUT -> accumulator (B, k+1, N) u64, bit-identical
    to refimpl.blind_rotate on truncate_bsk_u64(bsk, t) — or, in the
    hi-only accumulator mode (acc32, default when acc32_eligible), to
    blind_rotate_acc32_oracle.
    """
    from concrete_tpu.core import kernels as kn
    from concrete_tpu.ops import pallas_step as ps
    if interpret is None:
        interpret = not _on_tpu()
    if acc32 is None:
        acc32 = acc32_eligible(bsk)
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    kp1 = k + 1
    levels = params.pbs_level
    cin = levels * kp1
    n_small = bsk.n_small
    group_env = _os.environ.get("CONCRETE_TPU_FUSED_LHS_GROUP")
    # default: group enough slabs that each table-LHS dot has >= 128
    # output rows (a full MXU tile); at N=4096 (4*n1=128) that's g=1
    group = int(group_env) if group_env \
        else max(1, N2 // (4 * (n // N2)))
    tabs = build_fused_tables(n, bsk.primes, digit_limbs(bsk.base_log),
                              group=group)
    n_p = len(bsk.primes)

    switched = kn.modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1].astype(jnp.int32)             # (B, n_small)
    b_t = switched[:, -1]
    rot = (2 * n - b_t) % (2 * n)
    # component-major accumulator (kp1, B, n): every in-kernel row range
    # (digits, pointwise, inverse stack, update) is contiguous
    if acc32:
        # truncate to the top word BEFORE the b_t rotation: the masked
        # roll stages run on u32 instead of x64-emulated u64 (exact —
        # LUT encodings are multiples of 2^33; see the banded hi path)
        lut_hi = (kn._lut_rows(lut_poly, b_ct, n)
                  >> jnp.uint64(32)).astype(jnp.uint32)
        body0_hi = kn.monomial_mul_rolls(lut_hi, rot)
        hi0 = jnp.zeros((kp1, b_ct, n), dtype=jnp.uint32).at[k].set(
            body0_hi[:, 0, :])
        lo0 = None
    else:
        body0 = kn.monomial_mul_rolls(kn._lut_rows(lut_poly, b_ct, n), rot)
        acc0 = jnp.zeros((kp1, b_ct, n), dtype=jnp.uint64).at[k].set(
            body0[:, 0, :])
        lo0, hi0 = ps.split_u64(acc0.reshape(kp1 * b_ct, n))
        lo0 = lo0.reshape(kp1, b_ct, n)
        hi0 = hi0.reshape(kp1, b_ct, n)
    r_blk = row_block or _choose_row_block(b_ct, n, kp1, cin, n_p)
    kernel = functools.partial(
        _step_kernel, tabs=tabs, n=n, base_log=bsk.base_log, levels=levels,
        kp1=kp1, r_blk=r_blk, trunc_bits=bsk.trunc_bits, acc32=acc32)

    acc_spec = pl.BlockSpec((kp1, r_blk, n), lambda i, j: (_I0, i, _I0),
                            memory_space=pltpu.VMEM)
    spec_spec = pl.BlockSpec((1, n_p * cin * kp1, n),
                             lambda i, j: (j, _I0, _I0),
                             memory_space=pltpu.VMEM)

    def _tab(shape3):
        return pl.BlockSpec(shape3, lambda i, j: (_I0, _I0, _I0),
                            memory_space=pltpu.VMEM)

    acc_in_specs = [acc_spec] if acc32 else [acc_spec, acc_spec]
    acc_inputs = [hi0] if acc32 else [lo0, hi0]
    out_specs = acc_spec if acc32 else (acc_spec, acc_spec)
    out_shape = jax.ShapeDtypeStruct((kp1, b_ct, n), jnp.uint32)
    if not acc32:
        out_shape = (out_shape, out_shape)
    res = pl.pallas_call(
        kernel,
        grid=(b_ct // r_blk, n_small),
        in_specs=[
            pl.BlockSpec((r_blk, n_small), lambda i, j: (i, _I0),
                         memory_space=pltpu.VMEM),
            *acc_in_specs,
            spec_spec, spec_spec,
            _tab(tabs.w1f.shape), _tab(tabs.dft2.shape),
            _tab(tabs.dft2_off.shape),
            _tab(tabs.idft2.shape), _tab(tabs.v1i.shape),
            _tab(tabs.v1i_off.shape),
            _tab(tabs.twf_val.shape), _tab(tabs.twf_sh.shape),
            _tab(tabs.twi_val.shape), _tab(tabs.twi_sh.shape),
            _tab(tabs.twf16_val.shape), _tab(tabs.twf16_sh.shape),
            _tab(tabs.twf_bias.shape),
            _tab(tabs.twi16_val.shape), _tab(tabs.twi16_sh.shape),
            _tab(tabs.twi_bias.shape),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # default scoped-VMEM limit is 16 MB; v5e has 128 MB of VMEM.
            # r_blk=16 needs ~17.3 MB — allow headroom so larger row
            # blocks (fewer grid cells, better fixed-cost amortization)
            # are selectable (CONCRETE_TPU_FUSED_VMEM_MB to override).
            vmem_limit_bytes=int(_os.environ.get(
                "CONCRETE_TPU_FUSED_VMEM_MB", "24")) << 20),
        interpret=interpret,
    )(a_t, *acc_inputs, bsk.spec_val, bsk.spec_sh,
      tabs.w1f, tabs.dft2, tabs.dft2_off, tabs.idft2, tabs.v1i,
      tabs.v1i_off,
      tabs.twf_val, tabs.twf_sh, tabs.twi_val, tabs.twi_sh,
      tabs.twf16_val, tabs.twf16_sh, tabs.twf_bias,
      tabs.twi16_val, tabs.twi16_sh, tabs.twi_bias)
    if acc32:
        acc = (res.astype(jnp.uint64) << jnp.uint64(32))
    else:
        lo, hi = res
        acc = ps.merge_u64(lo.reshape(kp1 * b_ct, n),
                           hi.reshape(kp1 * b_ct, n)).reshape(kp1, b_ct, n)
    return jnp.moveaxis(acc, 0, 1)                       # (B, kp1, N)
