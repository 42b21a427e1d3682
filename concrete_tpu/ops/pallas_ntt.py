"""Pallas CRT-NTT primitives: per-stage transform kernels + in-kernel
modular arithmetic shared by the fused blind rotate (ops/pallas_fused_ntt).

History: this module originally also carried a per-stage blind-rotate
variant (one pallas_call per NTT stage).  It was retired in round 4 —
measured slower than both the banded path and the single-kernel fused
path at every N, because residues round-tripped HBM between the per-prime
stage kernels (RESULTS.md r3/r4); the fused kernel holds them in VMEM
across fwd -> pointwise -> inv.  What remains here is the validated
primitive layer:

- the standalone stage kernels (ntt_fwd_pallas / ntt_inv_pallas), kept as
  the hardware-testable unit surface for the transform math
  (tests/test_pallas_ntt.py, tools/check_pallas_ntt_tpu.py);
- the u32 modular-arithmetic toolbox (_mul_pair/_mont_mul/_lt_u32/
  _limbs4_i32/_combine4/_center_residues/_garner_value ...) imported by
  ops/pallas_fused_ntt.py.

Design notes for the kernels (all still true of the fused consumer):

- **One kernel per transform stage**: center + balanced int8 limb split +
  MXU matmul + plane combine + Montgomery reduction fused, so HBM sees
  only the u32 residues in and out.
- **Twiddles folded into the stage-2 matrices**: the four-step twiddle
  tw[i2, k1] multiplies into the per-k1 stage-2 DFT matrix host-side
  (one matrix per k1 value), removing the elementwise twiddle pass
  entirely.  The negacyclic psi twists fold into stage-1/stage-3 matrices
  the same way (as in ntt_tpu.build_plan).
- **Montgomery arithmetic in 32-bit pairs**: TPUs have no 64-bit vector
  datapath, and a generic Barrett/lazy fold ladder costs ~40+ VPU ops.
  Montgomery REDC needs one exact 32x32->64 product (4 16-bit partials)
  and lands at ~18 ops flat for ANY odd prime; all matrices and spectra
  are stored premultiplied by 2^32 mod p, so data residues stay in plain
  representation throughout.
- **4-plane limb-convolution matmuls**: matrix rows are premultiplied by
  2^(8a) mod p per data-limb index a, so the product needs only 4 output
  planes (not 7) and the combine is two packed i32 terms.

Factorization: n2 = 128 (the TPU lane width), n1 = N/128.  The kernels are
bit-exact against core/refimpl.py (tests/test_pallas_ntt.py) and produce
the same u64 external products as the banded path.

Reference parity: this is the device analog of concrete's FFT-domain
bootstrap inner loop (compiler/lib/Runtime wrappers + concrete-fft);
the reference has no NTT path — the CRT-NTT-on-MXU design is original.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from concrete_tpu.core import ntt as ntt_host

U32 = jnp.uint32
I32 = jnp.int32
_I0 = np.int32(0)   # index-map literal (python ints trace as i64 under x64)

N2 = 128            # stage-2 size = TPU lane width


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Host-side table construction
# ---------------------------------------------------------------------------

def _mont(x: int, p: int) -> int:
    """To Montgomery domain: x * 2^32 mod p."""
    return (x << 32) % p


def _center_i64(vals: np.ndarray, p: int) -> np.ndarray:
    v = np.asarray(vals, dtype=np.int64) % p
    return np.where(v > p // 2, v - p, v)


def _limb4(vals: np.ndarray) -> np.ndarray:
    """Balanced base-256 4-limb split of centered int64 values (|v| < 2^31),
    trailing limb axis."""
    from concrete_tpu.core import limbs as lb
    return np.asarray(lb.i32_digits_to_balanced_i8(
        vals.astype(np.int32), 4))


def _premult_planes(mat: np.ndarray, p: int) -> np.ndarray:
    """(K, L) mod-p matrix -> (4*K, L*4) int8 with rows premultiplied by
    the data-limb weight 2^(8a) and converted to the Montgomery domain:

      W[a*K + k, t*L + l] = limb_t(center(mat[k,l] * 2^(8a) * 2^32 mod p))

    so  limbs(x) @ W  yields 4 planes P_t with
    sum_t P_t * 2^(8t) == (x @ mat) * 2^32  (mod p).

    Rows are limb-MAJOR (a*K + k) and output columns plane-MAJOR
    (t*L + l): the kernel builds the lhs by concatenating the 4 data-limb
    arrays along lanes and reads the planes back as static lane slices —
    Mosaic cannot insert a minor dim on int8/int32 vectors, so the
    interleaved layouts would force unsupported in-kernel reshapes.
    """
    k_dim, l_dim = mat.shape
    out = np.empty((4, k_dim, 4, l_dim), dtype=np.int8)
    m64 = np.asarray(mat, dtype=np.int64) % p
    for a in range(4):
        weight = pow(2, 8 * a + 32, p)
        scaled = m64 * weight % p            # < 2^62, exact in int64
        out[a] = np.moveaxis(_limb4(_center_i64(scaled, p)), -1, 1)
    return np.ascontiguousarray(out.reshape(4 * k_dim, 4 * l_dim))


@dataclasses.dataclass(frozen=True)
class PallasPlan:
    """Per-(N, prime) tables for the fused kernels (device arrays)."""
    p: int
    p_neg_inv: int            # -p^-1 mod 2^32 (Montgomery constant)
    n1: int
    w1f: jnp.ndarray          # (n1*4, n1*4) i8: fwd stage-1 [i1 -> k1], psi
    w2f: jnp.ndarray          # (n1, n2*4, n2*4) i8: fwd stage-2 per k1,
    #                           twiddle-folded [i2 -> k2]
    v2i: jnp.ndarray          # (n1, n2*4, n2*4) i8: inv stage-1 per k1,
    #                           tw_i/N-folded [k2 -> i2]
    v1i: jnp.ndarray          # (n1*4, n1*4) i8: inv stage-2 [k1 -> i1], ipsi
    kappa: int                # (2^31 + 2^47) * 2^-32 mod p (combine offset)


@functools.lru_cache(maxsize=None)
def build_pallas_plan(n: int, p: int) -> PallasPlan:
    assert n % N2 == 0 and n >= 2 * N2, f"pallas NTT needs N >= 256, got {n}"
    n1 = n // N2
    g = ntt_host._primitive_root(p)
    psi = pow(g, (p - 1) // (2 * n), p)
    assert pow(psi, n, p) == p - 1
    w = psi * psi % p
    w1, w2 = pow(w, N2, p), pow(w, n1, p)    # order n1, order n2
    psi_i = pow(psi, -1, p)
    w1i, w2i = pow(w1, -1, p), pow(w2, -1, p)
    n_inv = pow(n, -1, p)

    i1 = np.arange(n1)
    i2 = np.arange(N2)

    def pows(base, exps):
        return np.array([pow(base, int(e) % (p - 1), p) for e in
                         np.asarray(exps).reshape(-1)],
                        dtype=np.int64).reshape(np.shape(exps))

    # fwd stage-1: A1[i1, k1] = psi^(i1*n2) * w1^(i1*k1)
    a1 = pows(w1, np.multiply.outer(i1, i1)) \
        * pows(psi, i1 * N2)[:, None] % p
    # fwd stage-2 per k1: A2[k1][i2, k2] = psi^i2 * w^(i2*k1) * w2^(i2*k2)
    base2 = pows(w2, np.multiply.outer(i2, i2))           # (n2, n2)
    tw_f = pows(psi, i2)[:, None] * pows(w, np.multiply.outer(i2, i1)) % p
    w2f = np.stack([_premult_planes(base2 * tw_f[:, k1][:, None] % p, p)
                    for k1 in range(n1)])
    # inv stage-1 per k1: B2[k1][k2, i2] = w2^(-k2*i2) * w^(-i2*k1)
    #                                      * psi^(-i2) / N
    ibase2 = pows(w2i, np.multiply.outer(i2, i2))         # (k2, i2)
    tw_i = pows(psi_i, i2)[None, :] * n_inv % p \
        * pows(pow(w, -1, p), np.multiply.outer(i1, i2)) % p   # (k1, i2)
    v2i = np.stack([_premult_planes(ibase2 * tw_i[k1][None, :] % p, p)
                    for k1 in range(n1)])
    # inv stage-2: B1[k1, i1] = w1^(-k1*i1) * psi^(-i1*n2)
    b1 = pows(w1i, np.multiply.outer(i1, i1)) \
        * pows(psi_i, i1 * N2)[None, :] % p

    kappa = (((1 << 31) + (1 << 47)) * pow(1 << 32, -1, p)) % p
    return PallasPlan(
        p=p, p_neg_inv=(-pow(p, -1, 1 << 32)) % (1 << 32), n1=n1,
        w1f=jnp.asarray(_premult_planes(a1, p)),
        w2f=jnp.asarray(w2f), v2i=jnp.asarray(v2i),
        v1i=jnp.asarray(_premult_planes(b1, p)),
        kappa=int(kappa))


# ---------------------------------------------------------------------------
# In-kernel 32-bit modular arithmetic (Montgomery, u32 pairs)
# ---------------------------------------------------------------------------

_SBIT = 1 << 31


def _lt_u32(a, b):
    """Unsigned a < b via the sign-flip trick: Mosaic's comparison
    lowering is only trusted for SIGNED i32, so flip the sign bit and
    compare signed (x ^ 2^31 maps u32 order onto i32 order).

    Scalar operands (e.g. a modulus constant) are broadcast to the other
    side's shape first: Mosaic's `tpu.bitcast` accepts vectors only.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    ai = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(a, shape) ^ U32(_SBIT), I32)
    bi = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(b, shape) ^ U32(_SBIT), I32)
    return ai < bi


def _shr16(x):
    """Logical x >> 16 for u32, masked so an arithmetic-shift lowering
    cannot smear the sign bit."""
    return (x >> U32(16)) & U32(0xFFFF)


def _shl16(x):
    """x << 16 mod 2^32 for u32 — as a multiply: Mosaic's vector
    shift-left-by-16 miscompiles on in-kernel i32/u32 chains (isolated on
    hardware by tools/probe_shl_variants.py: every `<< 16` formulation
    returns 0 on ~0.7% of lanes; `* 2^16` is exact)."""
    return x * U32(1 << 16)


def _mul_pair(a, b):
    """Exact u32 x u32 -> (hi, lo) via 16-bit partial products."""
    a0 = a & U32(0xFFFF)
    a1 = _shr16(a)
    b0 = b & U32(0xFFFF)
    b1 = _shr16(b)
    lo = a0 * b0
    m1 = a0 * b1
    mid = m1 + a1 * b0
    mc = _lt_u32(mid, m1).astype(U32)         # overflow at weight 2^48
    lo2 = lo + _shl16(mid)
    c2 = _lt_u32(lo2, lo).astype(U32)
    hi = a1 * b1 + _shr16(mid) + _shl16(mc) + c2
    return hi, lo2


def _redc(t_hi, t_lo, p: int, p_neg_inv: int):
    """Montgomery REDC of pair value t = t_hi*2^32 + t_lo < p*2^32:
    returns (t * 2^-32) mod p in [0, p)."""
    m = t_lo * U32(p_neg_inv)
    mp_hi, _mp_lo = _mul_pair(m, U32(p))
    carry = (t_lo != U32(0)).astype(U32)
    u = t_hi + mp_hi + carry                  # < 2p
    return u - U32(p) * (~_lt_u32(u, U32(p))).astype(U32)


def _mont_mul(a, b_mont, p: int, p_neg_inv: int):
    """a (plain residue) * b_mont (Montgomery-domain) mod p -> plain."""
    hi, lo = _mul_pair(a, b_mont)
    return _redc(hi, lo, p, p_neg_inv)


def _add_mod(a, b, p: int):
    s = a + b                                 # < 2p < 2^32, no wrap
    return s - U32(p) * (~_lt_u32(s, U32(p))).astype(U32)


def _sub_mod(a, b, p: int):
    d = a + (U32(p) - b)
    return d - U32(p) * (~_lt_u32(d, U32(p))).astype(U32)


def _limbs4_i32(x):
    """Balanced base-256 4-limb split of 2D i32 x: (M, K) -> (M, 4*K) int8,
    limb-major along lanes (matching _premult_planes' row order).
    The in-kernel (i32-only) version of limbs.i32_digits_to_balanced_i8;
    lane concatenation because Mosaic cannot insert an int8 minor dim."""
    outs = []
    v = x
    for i in range(4):
        if i < 3:
            t = v & I32(0xFF)
            carry = (t >= I32(128)).astype(I32)
            outs.append((t - (carry << I32(8))).astype(jnp.int8))
            v = (v >> I32(8)) + carry
        else:
            outs.append(v.astype(jnp.int8))
    return jnp.concatenate(outs, axis=-1)


def _combine4(planes, p: int, p_neg_inv: int, kappa: int):
    """Plane-major int32 planes (M, 4*L) -> (x @ mat) mod p as u32 (M, L).

    v = P0 + 2^8 P1 + 2^16 P2 + 2^24 P3 == result * 2^32 (mod p); formed
    as a non-negative u32 pair with a 2^31 + 2^47 offset, Montgomery-
    reduced, and the offset's (K * 2^-32 mod p) = kappa subtracted.
    P_t = planes[:, t*L:(t+1)*L] (static lane slices).
    """
    l_dim = planes.shape[-1] // 4
    g0 = planes[:, :l_dim] + (planes[:, l_dim:2 * l_dim] << I32(8))
    g1 = planes[:, 2 * l_dim:3 * l_dim] \
        + (planes[:, 3 * l_dim:] << I32(8))
    u0 = jax.lax.bitcast_convert_type(g0, U32) ^ U32(1 << 31)  # g0 + 2^31
    u1 = jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
    lo = u0 + _shl16(u1)
    c = _lt_u32(lo, u0).astype(U32)
    hi = _shr16(u1) + c                       # value = true + 2^31 + 2^47
    y = _redc(hi, lo, p, p_neg_inv)
    return _sub_mod(y, U32(kappa), p)


def _matmul_planes(x_i8, w_i8):
    """(M, 4K) i8 @ (4K, 4L) i8 -> (M, 4L) i32 planes on the MXU."""
    return jax.lax.dot_general(
        x_i8, w_i8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _center_residues(x_u32, p: int):
    """[0, p) u32 residues -> centered i32 in (-p/2, p/2]."""
    xi = jax.lax.bitcast_convert_type(x_u32, I32)
    big = _lt_u32(U32(p // 2), x_u32).astype(I32)
    return xi - big * I32(p)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _k_fwd1(plan: PallasPlan, x_ref, w_ref, o_ref):
    """Fwd stage-1: digits (R, n1, n2) i32 -> (R, n1, n2) u32 [m, k1, i2]."""
    r, n1, n2 = x_ref.shape
    xt = jnp.swapaxes(x_ref[...], 1, 2).reshape(r * n2, n1)   # (R*n2, n1)
    limbs = _limbs4_i32(xt)                                    # (R*n2, 4*n1)
    planes = _matmul_planes(limbs, w_ref[...])
    y = _combine4(planes, plan.p, plan.p_neg_inv, plan.kappa)
    o_ref[...] = jnp.swapaxes(y.reshape(r, n2, n1), 1, 2)


def _k_stage2(plan: PallasPlan, kc: int, x_ref, w_ref, o_ref):
    """Stage-2 (fwd or inv): a chunk of kc k1 values, each a (R, n2) u32
    residue slab times its own twiddle-folded matrix.  kc = min(8, n1)
    because Mosaic requires block dims (.., 8x, 128x); k1 slices within
    the chunk are static."""
    for j in range(kc):
        xc = _center_residues(x_ref[:, j, :], plan.p)         # (R, n2)
        limbs = _limbs4_i32(xc)                               # (R, 4*n2)
        planes = _matmul_planes(limbs, w_ref[j])
        o_ref[:, j, :] = _combine4(planes, plan.p, plan.p_neg_inv,
                                   plan.kappa)


def _k_inv2(plan: PallasPlan, x_ref, w_ref, o_ref):
    """Inv stage-2: (R, n1, n2) u32 [m, k1, i2] -> (R, n1, n2) [m, i1, i2]
    natural coefficient order."""
    r, n1, n2 = x_ref.shape
    xt = jnp.swapaxes(x_ref[...], 1, 2).reshape(r * n2, n1)   # rows m*n2+i2
    xc = _center_residues(xt, plan.p)
    limbs = _limbs4_i32(xc)                                    # (R*n2, 4*n1)
    planes = _matmul_planes(limbs, w_ref[...])
    y = _combine4(planes, plan.p, plan.p_neg_inv, plan.kappa)  # (R*n2, i1)
    o_ref[...] = jnp.swapaxes(y.reshape(r, n2, n1), 1, 2)


def _pick_rows(m: int, want: int) -> int:
    r = min(want, m)
    while m % r:
        r -= 1
    return r


def _rows_for_stage1(m: int, n: int) -> int:
    """Row block for the stage-1/inv-2 kernels under the 16 MB scoped-VMEM
    cap: ~36n B live per row (in + xt copy + i8 limbs + i32 planes + out)
    plus double buffering; budget ~4 MB of rows."""
    return _pick_rows(m, max(8, (4 << 20) // (36 * n)))


def ntt_fwd_pallas(digits_i32, plan: PallasPlan, interpret=None):
    """(M, N) i32 gadget digits (|d| < 2^30) -> (M, N) u32 spectrum
    [k1-major, k2-minor] mod plan.p."""
    if interpret is None:
        interpret = not _on_tpu()
    m, n = digits_i32.shape
    n1 = plan.n1
    x3 = digits_i32.reshape(m, n1, N2)
    r1 = _rows_for_stage1(m, n)
    y = pl.pallas_call(
        functools.partial(_k_fwd1, plan),
        grid=(m // r1,),
        in_specs=[
            pl.BlockSpec((r1, n1, N2), lambda i: (i, _I0, _I0)),
            pl.BlockSpec((n1 * 4, n1 * 4), lambda i: (_I0, _I0)),
        ],
        out_specs=pl.BlockSpec((r1, n1, N2), lambda i: (i, _I0, _I0)),
        out_shape=jax.ShapeDtypeStruct((m, n1, N2), jnp.uint32),
        interpret=interpret,
    )(x3, plan.w1f)
    return _stage2(y, plan.w2f, plan, interpret).reshape(m, n)


def _stage2(x3, w_stack, plan: PallasPlan, interpret):
    """Per-k1 stage-2 matmul: (M, n1, n2) u32 -> (M, n1, n2) u32, k1
    chunks as a grid dimension streaming the twiddle-folded matrices."""
    m, n1, n2 = x3.shape
    r2 = _pick_rows(m, 256)
    kc = min(8, n1)
    return pl.pallas_call(
        functools.partial(_k_stage2, plan, kc),
        grid=(n1 // kc, m // r2),
        in_specs=[
            pl.BlockSpec((r2, kc, N2), lambda k1, i: (i, k1, _I0)),
            pl.BlockSpec((kc, N2 * 4, N2 * 4),
                         lambda k1, i: (k1, _I0, _I0)),
        ],
        out_specs=pl.BlockSpec((r2, kc, N2), lambda k1, i: (i, k1, _I0)),
        out_shape=jax.ShapeDtypeStruct((m, n1, n2), jnp.uint32),
        interpret=interpret,
    )(x3, w_stack)


def ntt_inv_pallas(spec_u32, plan: PallasPlan, interpret=None):
    """(M, N) u32 spectrum [k1-major] -> (M, N) u32 coefficient residues."""
    if interpret is None:
        interpret = not _on_tpu()
    m, n = spec_u32.shape
    n1 = plan.n1
    t = _stage2(spec_u32.reshape(m, n1, N2), plan.v2i, plan, interpret)
    r1 = _rows_for_stage1(m, n)
    out = pl.pallas_call(
        functools.partial(_k_inv2, plan),
        grid=(m // r1,),
        in_specs=[
            pl.BlockSpec((r1, n1, N2), lambda i: (i, _I0, _I0)),
            pl.BlockSpec((n1 * 4, n1 * 4), lambda i: (_I0, _I0)),
        ],
        out_specs=pl.BlockSpec((r1, n1, N2), lambda i: (i, _I0, _I0)),
        out_shape=jax.ShapeDtypeStruct((m, n1, N2), jnp.uint32),
        interpret=interpret,
    )(t, plan.v1i)
    return out.reshape(m, n)


# ---------------------------------------------------------------------------
# Garner / CRT recombination to (lo, hi) u32 planes
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _garner_tables(primes: tuple):
    """inv[(i, j)] = p_i^-1 mod p_j in Montgomery form, mixed-radix digits
    of (P-1)/2 and P mod 2^64 for sign centering."""
    n = len(primes)
    inv_mont = {}
    for j in range(1, n):
        for i in range(j):
            inv_mont[(i, j)] = _mont(pow(primes[i], -1, primes[j]),
                                     primes[j])
    total = 1
    for p in primes:
        total *= p
    half = (total - 1) // 2
    h_digits = []
    rem = half
    for p in primes:
        h_digits.append(int(rem % p))
        rem //= p
    t64 = total % (1 << 64)
    return inv_mont, tuple(h_digits), (t64 >> 32, t64 & 0xFFFFFFFF)


def _pair_mul_const_mod64(hi, lo, c: int):
    """(hi:lo) * c mod 2^64 as a u32 pair."""
    mh, ml = _mul_pair(lo, U32(c))
    return hi * U32(c) + mh, ml


def _garner_value(primes: tuple, p_neg_invs: tuple, res_vals):
    """Mixed-radix reconstruction of per-prime residues into the exact
    centered value mod 2^64 as a (hi, lo) u32 pair."""
    inv_mont, h_digits, (t_hi, t_lo) = _garner_tables(primes)
    n = len(primes)
    digits = [res_vals[0]]
    for j in range(1, n):
        p_j = primes[j]
        t = res_vals[j]
        for i in range(j):
            gi = digits[i]
            gi = gi - U32(p_j) * (~_lt_u32(gi, U32(p_j))).astype(U32)
            t = _sub_mod(t, gi, p_j)
            t = _mont_mul(t, U32(inv_mont[(i, j)]), p_j, p_neg_invs[j])
        digits.append(t)
    # Horner mod 2^64 in u32 pairs
    v_hi = jnp.zeros_like(digits[-1])
    v_lo = digits[-1]
    for j in range(n - 2, -1, -1):
        v_hi, v_lo = _pair_mul_const_mod64(v_hi, v_lo, primes[j])
        s = v_lo + digits[j]
        v_hi = v_hi + _lt_u32(s, v_lo).astype(U32)
        v_lo = s
    # center: subtract P when mixed-radix digits exceed those of (P-1)/2
    gt = None
    for j in range(n):
        h = U32(h_digits[j])
        gt_j = _lt_u32(h, digits[j])          # unsigned >, sign-flip trick
        eq_j = digits[j] == h
        gt = gt_j if gt is None else gt_j | (eq_j & gt)
    g = gt.astype(U32)
    s = v_lo - U32(t_lo) * g
    borrow = _lt_u32(v_lo, s).astype(U32)
    return v_hi - U32(t_hi) * g - borrow, s
