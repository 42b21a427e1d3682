"""Batched JAX/XLA TFHE kernels — the TPU compute path.

Every function here matches ``concrete_tpu.core.refimpl`` (the numpy oracle)
bit-for-bit; tests/test_kernels.py enforces that.  Design notes:

- Batch-first: the unit of work is a *batch* of ciphertexts (the reference's
  ``Batching.cpp`` pass reached the same conclusion for CPU; here the batch is
  a native kernel axis).
- Exact arithmetic mod 2^64: the external product's polynomial products are
  computed over balanced int8 limb planes with int32 accumulation (MXU path),
  see core/limbs.py — replacing the reference's f64 FFT (wrappers.cpp:762,
  tfhe-rs fft path) with an exact integer convolution.
- The bootstrap key is pre-processed at keygen time into negacyclically
  extended int8 limb planes ("banded limb BSK"), the analog of the
  reference's Fourier-domain BSK cached in RuntimeContext
  (include/concretelang/Runtime/context.h:63-72); the external product is a
  set of banded Toeplitz int8 matmuls on the MXU.
- Elementwise u64 work (rotation, decomposition, recombination) runs as
  fused u32-pair Pallas kernels on TPU (concrete_tpu/ops/pallas_step.py)
  and as XLA x64-emulated ops on CPU; both are bit-identical.

Shapes use B = batch, n = small LWE dim, k = GLWE dim, N = poly size,
l = decomposition levels.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from concrete_tpu.core import limbs as lb
from concrete_tpu.params import CryptoParams

U64 = jnp.uint64
_Q_LOG = 64


# ---------------------------------------------------------------------------
# Elementwise torus ops (match refimpl exactly)
# ---------------------------------------------------------------------------

def decompose(v, base_log: int, levels: int):
    """Balanced gadget decomposition -> int32 digits (..., levels).

    Same closed form as refimpl.decompose: d_j = w_j - (w_{j-1} << B) with
    w_j = round_half_up(v / 2^(64 - jB)).
    """
    assert levels * base_log <= 63
    v = v.astype(U64)
    ws = []
    for j in range(levels + 1):
        shift = _Q_LOG - j * base_log - 1
        ws.append(((v >> U64(shift)) + U64(1)) >> U64(1))
    digits = []
    for j in range(1, levels + 1):
        d = ws[j] - (ws[j - 1] << U64(base_log))
        # wrap to signed: digits are tiny, so low 32 bits carry the value
        digits.append(d.astype(jnp.int32))
    return jnp.stack(digits, axis=-1)


def decompose_hi32(v, base_log: int, levels: int):
    """decompose() reading only the top u32 word — exact whenever
    levels * base_log <= 31 (then every w_j = round_half_up(v / 2^s)
    uses v >> (s-1) with s-1 >= 32, plus a +1 rounding carry that a u32
    computes correctly: the carry out of bit 31 of (v >> (s-1)) + 1 can
    only occur when the low 32 bits of the shifted value are all ones,
    which the u32 add reproduces).  Avoids XLA's x64 emulation (~5x the
    u32 op count) on the keyswitch decompose hot path.
    """
    assert levels * base_log <= 31, (base_log, levels)
    hi = (v.astype(U64) >> U64(32)).astype(jnp.uint32)
    ws = []
    for j in range(levels + 1):
        if j == 0:
            ws.append(hi >> jnp.uint32(31))
            continue
        s = _Q_LOG - j * base_log
        t = hi >> jnp.uint32(s - 33)
        u = t + jnp.uint32(1)
        ov = (t == jnp.uint32(0xFFFFFFFF)).astype(jnp.uint32)
        ws.append((u >> jnp.uint32(1)) | (ov << jnp.uint32(31)))
    digits = []
    for j in range(1, levels + 1):
        d = ws[j] - (ws[j - 1] << jnp.uint32(base_log))
        digits.append(jax.lax.bitcast_convert_type(d, jnp.int32))
    return jnp.stack(digits, axis=-1)


def modulus_switch(v, log2_poly_size: int):
    """u64 torus -> [0, 2N) with round-half-up (simulation.cpp:60-75)."""
    shift = U64(_Q_LOG - log2_poly_size - 2)
    v = v.astype(U64) >> shift
    v = v + (v & U64(1))
    v = v >> U64(1)
    return (v & U64((1 << (log2_poly_size + 1)) - 1)).astype(jnp.int32)


def monomial_mul_batch(polys, r):
    """X^r * poly mod (X^N + 1) for batched polys (..., N) and per-batch
    rotations r (...,) int32 in [0, 2N)."""
    n = polys.shape[-1]
    j = jnp.arange(n, dtype=jnp.int32)
    src = (j - r[..., None]) % (2 * n)          # (..., N)
    neg = src >= n
    src = jnp.where(neg, src - n, src)
    out = jnp.take_along_axis(polys, src.astype(jnp.int32), axis=-1)
    return jnp.where(neg, jnp.uint64(0) - out, out)


def monomial_mul_rolls(polys, r):
    """Same as monomial_mul_batch but via log2(2N) masked static rolls.

    TPU gathers with per-element dynamic indices lower catastrophically; a
    chain of static rolls selected per-row by the bits of r is vastly faster.
    polys: (B, C, N) u64; r: (B,) int32 in [0, 2N).
    """
    b_ct, c, n = polys.shape
    # dtype-generic: the hi-only accumulator paths roll the top u32 word
    # alone (exact while the low word is zero: -(h*2^32) has hi word
    # (0-h) mod 2^32), quartering the x64-emulated u64 roll cost
    zero = jnp.zeros((), dtype=polys.dtype)
    ext = jnp.concatenate([polys, zero - polys], axis=-1)    # (B, C, 2N)
    bits = int(2 * n - 1).bit_length()
    for b in range(bits):
        amount = 1 << b
        rolled = jnp.roll(ext, amount, axis=-1)
        take = ((r >> b) & 1).astype(bool)[:, None, None]
        ext = jnp.where(take, rolled, ext)
    return ext[..., :n]


def encode_expand_lut_jnp(table_vals, poly_size: int, message_bits: int,
                          out_bits: int, signed: bool = False):
    """Traceable (in-jit) version of refimpl.encode_expand_lut for dynamic
    table lookups: the table arrives as a runtime clear tensor, so the
    accumulator polynomial is built inside the compiled circuit.

    table_vals: (2^message_bits,) integer tensor (raw entries; wrapped mod
    2^(out_bits+1) like the static path).  Bit-identical to
    refimpl.encode_expand_lut for equal inputs.
    """
    mask = jnp.int64((1 << (out_bits + 1)) - 1)
    lut = (table_vals.astype(jnp.int64) & mask).astype(U64)
    if signed:
        half = lut.shape[-1] // 2
        lut = jnp.concatenate([lut[half:], lut[:half]])
    scaled = lut << U64(64 - out_bits - 1)
    mega = poly_size // lut.shape[-1]
    naive = jnp.repeat(scaled, mega)
    ext = jnp.concatenate([naive, U64(0) - naive])      # negacyclic ext
    shift = 2 * poly_size - mega // 2                   # X^{-mega/2}
    return jnp.roll(ext, shift)[..., :poly_size]


# ---------------------------------------------------------------------------
# Exact negacyclic limb convolution (the MXU workhorse)
# ---------------------------------------------------------------------------

def _flip_kernel_limbs(w_limbs: np.ndarray) -> np.ndarray:
    """Pre-flip a limb kernel so XLA's cross-correlation computes a true
    convolution: reverse both the limb axis and the coefficient axis.

    w_limbs: (..., S, N) int8 -> same shape, flipped on the last two axes.
    """
    return w_limbs[..., ::-1, ::-1]


def negacyclic_limb_conv(d_limbs, w_limbs_flipped, precision=jnp.int32):
    """Exact negacyclic product planes via one 2-D convolution.

    d_limbs:          (B, Cin, A, N) int8 — digit limb planes.
    w_limbs_flipped:  (Cout, Cin, S, N) int8 — weight limb planes, pre-flipped
                      on (S, N) (see _flip_kernel_limbs), S = 8.
    Returns           (B, Cout, 8, N) int32: plane s = sum over limb pairs
                      a+beta == s of the negacyclic conv over N.

    mod-2^64 recombination of the 8 planes gives the exact u64 result.
    """
    b, cin, a_limbs, n = d_limbs.shape
    cout, cin2, s_limbs, n2 = w_limbs_flipped.shape
    assert cin == cin2 and n == n2
    out = lax.conv_general_dilated(
        d_limbs.astype(precision),
        w_limbs_flipped.astype(precision),
        window_strides=(1, 1),
        padding=((s_limbs - 1, 8 - a_limbs), (n - 1, n - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=precision,
    )                                            # (B, Cout, 8, 2N-1)
    lin = out
    hi = jnp.pad(lin[..., n:], ((0, 0), (0, 0), (0, 0), (0, 1)))
    return lin[..., :n] - hi                     # negacyclic fold


def negacyclic_banded_matmul(d_limbs, vv, block: int):
    """Exact negacyclic limb product via banded Toeplitz int8 matmuls (MXU).

    The negacyclic product (d (*) w)[t] = sum_j d[j] * v[t - j] with
    v[x] = w[x] for x >= 0 and v[x] = -w[N+x] for x < 0.  Tiling t and j into
    blocks of `block`, each (j-block I -> t-block J) contribution is a
    ``block x block`` Toeplitz slice of v at band J - I.  We materialize the
    sliding-window matrix M[r, y] = vv[y + block - 1 - r] once per call with
    static slices, then slice bands out of it — every product is then a plain
    int8 matmul, which XLA maps onto the MXU (unlike a poly-sized
    convolution, which it lowers to a catastrophically slow VPU loop).

    d_limbs: (B, Cin, N, A) int8 digit limb planes (limb axis last so the
             per-limb slice is layout-friendly).
    vv:      (Cin, Cout, 8, 2N-1) int8 — negacyclic extension
             concat([-w[..., 1:], w]) of the weight limb planes.
    Returns  (B, Cout, 8 + A - 1, N) int32 limb-product planes
             (recombine planes [0, 8) mod 2^64).
    """
    b_ct, cin, n, a_limbs = d_limbs.shape
    lhs_list = [d_limbs[..., a].reshape(b_ct, cin * n)
                for a in range(a_limbs)]
    return negacyclic_banded_matmul_planes(lhs_list, vv, block)


def negacyclic_banded_matmul_fused(lhs_list, vv, block: int,
                                   out_planes: int = None):
    """Single-dot variant of negacyclic_banded_matmul_planes.

    The per-j-block formulation dispatches nb matmuls per step and
    scatter-adds their outputs into a (B, Cout, S+A-1, nb, block) planes
    buffer — measured 12.8 ms of the 17.7 ms N=1024 blind-rotate step at
    B=16k (tools/profile_banded_step.py), ~4.7x the MXU floor of its dots.
    Here the WHOLE step is one int8 matmul:

      lhs  (B, A*Cin*N)   = digit limb planes concatenated over a
      rhs  (A*Cin*N, Cout*(S+A-1)*N)
           rhs[(a, cin, i), (cout, splane, j)] = vv[cin, cout, splane - a,
                                                    N-1 + j - i]
           (zero where splane - a is outside [0, S))

    so the a-limb shift structure lives in the rhs columns, the nb j-block
    matmuls collapse into one MXU-friendly dot, and the output is already
    (B, Cout, S+A-1, N) — no scatter.  Extra zero MACs: (A-1)/S of the
    useful work (0 for A=1).  rhs bytes = A*Cin*N * Cout*(S+A-1)*N — the
    caller gates on this (N=1024-class steps fit easily).

    `out_planes` (default S+A-1) truncates the produced limb planes: the
    blind-rotate step discards planes >= keep anyway, so the fused rhs
    simply omits those columns (the j-block formulation can't — its
    scatter-add needs the full buffer).
    """
    a_limbs = len(lhs_list)
    b_ct = lhs_list[0].shape[0]
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = (two_n_m1 + 1) // 2
    nb = n // block
    assert n % block == 0
    width = (2 * nb - 1) * block
    # sliding windows: m[cin, r, cout, s, x] = vv[cin, cout, s, x+block-1-r]
    m = jnp.stack([
        lax.slice_in_dim(vv, block - 1 - r, block - 1 - r + width, axis=-1)
        for r in range(block)], axis=1)          # (Cin, r, Cout, S, width)
    # all (i_blk, j_blk) band blocks as static slices -> one rhs
    rows = []
    for i_blk in range(nb):
        band = jnp.stack([
            lax.slice_in_dim(m, (j_blk - i_blk + nb - 1) * block,
                             (j_blk - i_blk + nb - 1) * block + block,
                             axis=-1)
            for j_blk in range(nb)], axis=-2)    # (Cin, r, Cout, S, nb_j, t)
        rows.append(band)
    rhs = jnp.stack(rows, axis=1)                # (Cin, nb_i, r, Cout, S, nb_j, t)
    rhs = rhs.reshape(cin * n, cout, s_limbs, n)
    s_total = s_limbs + a_limbs - 1
    if out_planes is None:
        out_planes = s_total
    if a_limbs == 1:
        rhs_full = rhs[:, :, :out_planes, :].reshape(
            cin * n, cout * min(out_planes, s_limbs) * n)
        lhs = lhs_list[0]
    else:
        # embed the a-limb plane shift in zero-padded column copies
        pads = []
        for a in range(a_limbs):
            padded = jnp.pad(rhs, ((0, 0), (0, 0),
                                   (a, s_total - s_limbs - a), (0, 0)))
            pads.append(padded[:, :, :out_planes, :])
        rhs_full = jnp.stack(pads, axis=0).reshape(
            a_limbs * cin * n, cout * min(out_planes, s_total) * n)
        lhs = jnp.concatenate(lhs_list, axis=1)
    planes = jnp.matmul(lhs, rhs_full, preferred_element_type=jnp.int32)
    return planes.reshape(b_ct, cout, min(out_planes, s_total), n)


#: fuse the banded step into one dot when the materialized rhs stays under
#: this many bytes (the N=1024-class steps; large-N steps take the NTT path
#: anyway)
FUSED_BANDED_RHS_MAX_BYTES = 384 * 1024 * 1024

#: the dot+recombine Pallas kernel streams its rhs tile-by-tile, so the
#: materialized rhs only has to fit HBM comfortably (N=4096 6-bit steps
#: build ~1.4 GB per scan step)
FUSEDRECOMBINE_RHS_MAX_BYTES = 2 * 1024 * 1024 * 1024


def _fused_rhs_bytes(a_limbs, cin, cout, out_planes, n) -> int:
    return a_limbs * cin * n * cout * out_planes * n


def _banded_matmul_auto(lhs_list, vv, block: int):
    """Pick the fused single-dot step when its rhs fits, else the j-block
    formulation.  Both are exact and bit-identical."""
    a_limbs = len(lhs_list)
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = (two_n_m1 + 1) // 2
    s_total = s_limbs + a_limbs - 1
    if _fused_rhs_bytes(a_limbs, cin, cout, s_total,
                        n) <= FUSED_BANDED_RHS_MAX_BYTES:
        return negacyclic_banded_matmul_fused(lhs_list, vv, block)
    return negacyclic_banded_matmul_planes(lhs_list, vv, block)


def negacyclic_banded_matmul_planes(lhs_list, vv, block: int):
    """Core of the banded matmul: lhs_list[a] is the (B, Cin*N) int8 plane of
    digit limb a; vv as in negacyclic_banded_matmul."""
    a_limbs = len(lhs_list)
    b_ct = lhs_list[0].shape[0]
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = (two_n_m1 + 1) // 2
    nb = n // block
    assert n % block == 0
    # M: (Cin, r=block, Cout, S, (2*nb-1)*block) sliding windows of vv
    width = (2 * nb - 1) * block
    m = jnp.stack([
        lax.slice_in_dim(vv, block - 1 - r, block - 1 - r + width, axis=-1)
        for r in range(block)], axis=1)                      # (Cin, r, Cout, S, width)
    planes = jnp.zeros((b_ct, cout, s_limbs + a_limbs - 1, nb, block),
                       dtype=jnp.int32)
    for j_blk in range(nb):
        # rhs: stack the nb band slices (band = J - I) -> (Cin, I, r, Cout, S, t)
        rhs = jnp.stack([
            lax.slice_in_dim(m, (j_blk - i_blk + nb - 1) * block,
                             (j_blk - i_blk + nb - 1) * block + block, axis=-1)
            for i_blk in range(nb)], axis=1)
        rhs = rhs.reshape(cin * nb * block, cout * s_limbs * block)
        for a in range(a_limbs):
            out = jnp.matmul(lhs_list[a], rhs,
                             preferred_element_type=jnp.int32)
            out = out.reshape(b_ct, cout, s_limbs, block)
            planes = planes.at[:, :, a:a + s_limbs, j_blk, :].add(out)
    return planes.reshape(b_ct, cout, s_limbs + a_limbs - 1, n)


# ---------------------------------------------------------------------------
# Key material pre-processing (host side, numpy)
# ---------------------------------------------------------------------------

@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["planes"],
                   meta_fields=["base_log", "levels", "truncate_limbs"])
@dataclasses.dataclass(frozen=True)
class LimbBSK:
    """Bootstrap key as negacyclically-extended int8 limb planes:
    (n, Cin=(k+1)l, Cout=k+1, 8, 2N-1).

    planes[i, cin, cout, :, :] are the balanced limb planes of the *extended
    value sequence* vv = [-(w[1:]) mod 2^64, w] of BSK polynomial w — the
    Toeplitz generator for the banded-matmul external product.  Our analog of
    the reference's Fourier BSK (context.h:63-72), computed once at keygen.
    (The negation happens on u64 values before limb decomposition so every
    limb stays in [-128, 127].)
    """
    planes: jnp.ndarray
    base_log: int
    levels: int
    truncate_limbs: int = 0

    @property
    def n_small(self) -> int:
        return self.planes.shape[0]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["planes"], meta_fields=["base_log", "levels"])
@dataclasses.dataclass(frozen=True)
class LimbKSK:
    """Keyswitch key as int8 limb planes (n_in, l, n_out+1, 8) plus layout."""
    planes: jnp.ndarray
    base_log: int
    levels: int


def pack_bsk(bsk_u64: np.ndarray, params: CryptoParams,
             truncate_limbs: int = 0) -> LimbBSK:
    """Preprocess a u64 BSK (n, l, k+1, k+1, N) into banded limb planes.

    Output layout: (n, Cin, Cout, S, 2N-1) where Cin = lev * (k+1) + r indexes
    the decomposed accumulator rows and Cout the output GLWE component; the
    last axis is the negacyclic extension [-(w[1:]), w] (u64 negation first,
    then balanced limb split).

    truncate_limbs: drop that many *low* limb planes of the BSK (S = 8 - t).
    This trades a provably negligible extra noise term
    (params.variance_bsk_limb_truncation) for ~25-30% fewer MXU MACs — the
    exact-integer analog of the reference's f64-FFT precision loss
    (fft_noise_variance), but with a much smaller, tunable magnitude.
    """
    bsk_u64 = np.asarray(bsk_u64)
    n, l, kp1, kp1_, big_n = bsk_u64.shape
    ext = np.concatenate(
        [(np.uint64(0) - bsk_u64[..., 1:]), bsk_u64], axis=-1)  # (n,l,r,c,2N-1)
    limbs = np.moveaxis(lb.u64_to_balanced_i8(ext), -1, -2)     # (n,l,r,c,8,2N-1)
    # (n, Cin=l*r, Cout=c, 8, 2N-1): Cin index = lev * (k+1) + r
    limbs = limbs.reshape(n, l * kp1, kp1, 8, 2 * big_n - 1)
    if truncate_limbs:
        limbs = limbs[:, :, :, truncate_limbs:, :]
    return LimbBSK(planes=jnp.asarray(limbs), base_log=params.pbs_base_log,
                   levels=params.pbs_level, truncate_limbs=truncate_limbs)


def pack_ksk(ksk_u64: np.ndarray, params: CryptoParams) -> LimbKSK:
    """Preprocess a u64 KSK (n_in, l, n_out+1) into int8 limb planes."""
    limbs = lb.u64_to_balanced_i8(np.asarray(ksk_u64))       # (n_in, l, m, 8)
    return LimbKSK(planes=jnp.asarray(limbs), base_log=params.ks_base_log,
                   levels=params.ks_level)


# ---------------------------------------------------------------------------
# Keyswitch (batched)
# ---------------------------------------------------------------------------

def keyswitch(ct, ksk: LimbKSK):
    """Batched LWE keyswitch: (B, n_in+1) u64 -> (B, n_out+1) u64.

    out = (0.., b) - sum_{i,j} Decomp_j(a_i) * KSK[i][j], with the products
    over int8 limb planes on the MXU: for each digit-limb a, an int8 matmul
    (B, n_in*l) @ (n_in*l, (n_out+1)*8) accumulated into shifted planes.
    """
    n_in = ksk.planes.shape[0]
    n_out_p1 = ksk.planes.shape[2]
    b_ct = ct.shape[0]
    a, body = ct[:, :n_in], ct[:, n_in]
    if ksk.levels * ksk.base_log <= 31:
        digits = decompose_hi32(a, ksk.base_log, ksk.levels)  # (B,n_in,l)
    else:
        digits = decompose(a, ksk.base_log, ksk.levels)      # (B, n_in, l)
    a_limbs_n = lb.num_digit_limbs(ksk.base_log)
    d_limbs = lb.i32_digits_to_balanced_i8(digits, a_limbs_n)  # (B,n_in,l,A)
    d_limbs = d_limbs.reshape(b_ct, n_in * ksk.levels, a_limbs_n)
    k_planes = ksk.planes.reshape(n_in * ksk.levels, n_out_p1 * 8)
    planes = jnp.zeros((b_ct, n_out_p1, 8 + a_limbs_n - 1), dtype=jnp.int32)
    for a_idx in range(a_limbs_n):
        prod = jnp.matmul(d_limbs[:, :, a_idx].astype(jnp.int8), k_planes,
                          preferred_element_type=jnp.int32)
        planes = planes.at[:, :, a_idx:a_idx + 8].add(
            prod.reshape(b_ct, n_out_p1, 8))
    acc = lb.recombine_i32_planes_to_u64(planes[:, :, :8])   # (B, n_out+1)
    out = jnp.zeros((b_ct, n_out_p1), dtype=U64).at[:, -1].set(body)
    return out - acc


# ---------------------------------------------------------------------------
# Blind rotation (batched scan over the small LWE dimension)
# ---------------------------------------------------------------------------

#: use the fused Pallas banded matmul inside the pallas blind rotate (the
#: XLA banded matmul spends more time materializing band stacks than on the
#: dots themselves).  Off by default: the kernel is bit-exact (tests) but
#: its compile time on the remote-compile path is still being qualified.
import os as _os
USE_FUSED_BANDED_MM = _os.environ.get("CONCRETE_TPU_FUSED_MM", "0") == "1"

#: banded-matmul formulation inside the throughput blind-rotate step:
#:   "planes"   - per-j-block matmuls + scatter-add into the planes buffer
#:   "fuseddot" - ONE int8 dot per step: band blocks + digit-limb shifts
#:                embedded in the rhs columns, truncated planes never
#:                computed (negacyclic_banded_matmul_fused)
#:   "pallas"   - fused Pallas kernel (legacy CONCRETE_TPU_FUSED_MM)
#:   "auto"     - fuseddot when its rhs fits FUSED_BANDED_RHS_MAX_BYTES
#: Default "auto": hardware-measured on the N=1024 4-bit bench shapes
#: (tools/profile_banded_step.py, B=16384): full step 13.96 ms/step
#: fuseddot vs 16.50 planes (1654 vs 1398 PBS/s) — the j-block dispatch
#: and scatter-adds cost more than the fused dot's (A-1)/S zero MACs.
BANDED_MM_MODE = _os.environ.get(
    "CONCRETE_TPU_BANDED_MM", "pallas" if USE_FUSED_BANDED_MM else "auto")


def _use_pallas_default() -> bool:
    return jax.default_backend() not in ("cpu",)


#: batches at or below this size take the latency-mode blind rotate (band
#: stacks built from the tiny accumulator digits instead of the BSK step).
LATENCY_BATCH_MAX = int(_os.environ.get("CONCRETE_TPU_LATENCY_BATCH_MAX",
                                        "4"))


def blind_rotate(ct_small, bsk, lut_poly, params: CryptoParams,
                 use_pallas: bool = None):
    """Batched blind rotation: (B, n+1) u64, LUT poly (N,) u64 ->
    accumulator (B, k+1, N) u64.

    `bsk` dispatches the algorithm: a LimbBSK runs the banded int8-matmul
    path, a pallas_fused_ntt.FusedBSK the single-kernel CRT-NTT path —
    the dispatch lives HERE so every caller (pbs_batch, the WoP
    sign-PBS/bit-extract, simulation probes) follows the keyset's choice;
    a WoP circuit at N >= 8192 with a fused keyset used to fall into the
    banded path, whose sliding band stacks at N=16384 are hundreds of GB.

    use_pallas: run the elementwise phases (rotate/decompose/limb-split and
    recombine/accumulate) as fused Pallas u32-pair kernels, keeping the
    accumulator in (lo, hi) planes across the scan.  Default: on for TPU
    backends, off for CPU (Pallas CPU needs interpret mode).
    """
    from concrete_tpu.ops.pallas_fused_ntt import (FusedBSK,
                                                   blind_rotate_fused)
    if isinstance(bsk, FusedBSK):
        return blind_rotate_fused(ct_small, bsk, lut_poly, params)
    if ct_small.shape[0] <= LATENCY_BATCH_MAX:
        return _blind_rotate_xla_latency(ct_small, bsk, lut_poly, params)
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        return _blind_rotate_pallas(ct_small, bsk, lut_poly, params)
    return _blind_rotate_xla(ct_small, bsk, lut_poly, params)


def _lut_rows(lut_poly, b_ct: int, n: int):
    """Broadcast a shared (N,) or per-batch (B, N) LUT poly to (B, 1, N)."""
    lut_poly = jnp.asarray(lut_poly)
    if lut_poly.ndim == 1:
        return jnp.broadcast_to(lut_poly, (b_ct, 1, n))
    return lut_poly.reshape(b_ct, 1, n)


def _acc32_eligible(bsk: LimbBSK, params: CryptoParams, b_ct: int) -> bool:
    """Hi-only accumulator mode: every kept BSK limb plane lands at a
    product shift 8*(s + truncate_limbs) >= 32 AND the gadget digits read
    only the accumulator's high word — then the u64 accumulator's low word
    is IDENTICALLY ZERO through the whole scan (the LUT encoding
    refimpl.encode_expand_lut shifts by 64 - out_bits - 1 >= 33 for every
    out_bits <= 30, and each step adds multiples of 2^32), and the scan
    can run on single u32 planes: half the roll/select work, a carry-free
    recombine.  Bit-exact to the u64 oracle, not an approximation."""
    from concrete_tpu.ops import pallas_step as ps
    if _os.environ.get("CONCRETE_TPU_ACC32", "1") != "1":
        return False
    return (bsk.truncate_limbs * 8 >= 32
            and ps.digits_lo_free(params.pbs_base_log, params.pbs_level)
            and params.polynomial_size % 128 == 0)


def _blind_rotate_pallas_hi(ct_small, bsk: LimbBSK, lut_poly,
                            params: CryptoParams):
    """Hi-only-accumulator blind rotate (see _acc32_eligible).  Only the
    fusedrecombine dot path is implemented; callers gate on
    _acc32_eligible AND the fusedrecombine rhs-size conditions."""
    from concrete_tpu.ops import pallas_step as ps
    from concrete_tpu.ops.pallas_dot_recombine import (
        build_fused_rhs, dot_recombine_hi)
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    kp1 = k + 1
    switched = modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]
    b_t = switched[:, -1]
    # the encode guarantee: LUT torus values are multiples of 2^33; the
    # explicit shift keeps the mode exact even for hand-built LUTs (any
    # dropped low bits are below every noise term by > 30 bits).
    # Truncate BEFORE the b_t rotation: the 12 masked roll stages then
    # run on a single u32 plane instead of x64-emulated u64 (~4x fewer
    # VPU ops on a B x 2N array)
    lut_hi = (_lut_rows(lut_poly, b_ct, n) >> U64(32)).astype(jnp.uint32)
    body0_hi = monomial_mul_rolls(lut_hi, (2 * n - b_t) % (2 * n))
    hi0 = jnp.zeros((b_ct, kp1, n), dtype=jnp.uint32).at[:, k, :].set(
        body0_hi[:, 0, :]).reshape(b_ct * kp1, n)

    a_limbs_n = lb.num_digit_limbs(params.pbs_base_log)
    keep = 8 - bsk.truncate_limbs
    s_keep = min(keep, 8 + a_limbs_n - 1)

    def step(hi, xs):
        a_j, w_vv = xs
        a_rows = jnp.repeat(a_j, kp1, total_repeat_length=b_ct * kp1)
        d_planes = ps.rotate_decompose_limbs_hi(
            hi, a_rows, base_log=params.pbs_base_log, levels=l,
            a_limbs=a_limbs_n)
        # segmented lhs: one (B, kp1*N) row segment per (digit limb,
        # level) in rhs row order — dot_recombine_hi contracts the
        # segments in place, skipping the XLA concat copy of the digit
        # planes (~135 MB/step at the bench shape)
        segs = [d_planes[lev * a_limbs_n + a].reshape(b_ct, kp1 * n)
                for a in range(a_limbs_n) for lev in range(l)]
        rhs = build_fused_rhs(w_vv, 128, s_keep, a_limbs=a_limbs_n)
        hi2 = dot_recombine_hi(
            segs, rhs, hi.reshape(b_ct, kp1 * n), keep=s_keep,
            limb_offset=bsk.truncate_limbs)
        return hi2.reshape(b_ct * kp1, n), None

    hi, _ = lax.scan(step, hi0, (a_t.T, bsk.planes))
    return (hi.astype(U64) << U64(32)).reshape(b_ct, kp1, n)


def _blind_rotate_pallas(ct_small, bsk: LimbBSK, lut_poly,
                         params: CryptoParams):
    from concrete_tpu.ops import pallas_step as ps
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    kp1 = k + 1
    if _acc32_eligible(bsk, params, b_ct) and BANDED_MM_MODE == "auto":
        a_limbs_n = lb.num_digit_limbs(params.pbs_base_log)
        cin = l * kp1
        keep = 8 - bsk.truncate_limbs
        bytes_ = _fused_rhs_bytes(a_limbs_n, cin, kp1, keep, n)
        k_dim = a_limbs_n * cin * n
        if (bytes_ <= FUSEDRECOMBINE_RHS_MAX_BYTES
                and k_dim * keep <= 8192 * 4):
            return _blind_rotate_pallas_hi(ct_small, bsk, lut_poly, params)
    switched = modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]
    b_t = switched[:, -1]
    body0 = monomial_mul_rolls(
        _lut_rows(lut_poly, b_ct, n), (2 * n - b_t) % (2 * n))
    acc0 = jnp.zeros((b_ct, kp1, n), dtype=U64).at[:, k, :].set(
        body0[:, 0, :])
    lo0, hi0 = ps.split_u64(acc0.reshape(b_ct * kp1, n))

    a_limbs_n = lb.num_digit_limbs(params.pbs_base_log)
    block = min(128, n)
    keep = 8 - bsk.truncate_limbs

    def step(carry, xs):
        lo, hi = carry                                       # (B*(k+1), N) u32
        a_j, w_vv = xs
        a_rows = jnp.repeat(a_j, kp1, total_repeat_length=b_ct * kp1)
        d_planes = ps.rotate_decompose_limbs(
            lo, hi, a_rows, base_log=params.pbs_base_log, levels=l,
            a_limbs=a_limbs_n)
        # lhs per digit limb a: (B, Cin*N), Cin = lev*(k+1)+r
        lhs_list = []
        for a in range(a_limbs_n):
            if l == 1:
                lhs = d_planes[a].reshape(b_ct, kp1 * n)
            else:
                lhs = jnp.concatenate(
                    [d_planes[lev * a_limbs_n + a].reshape(b_ct, kp1, n)
                     for lev in range(l)], axis=1).reshape(b_ct, l * kp1 * n)
            lhs_list.append(lhs)
        mode = BANDED_MM_MODE
        if mode == "auto":
            cin = l * kp1
            bytes_ = _fused_rhs_bytes(a_limbs_n, cin, kp1, keep, n)
            k_dim = a_limbs_n * cin * n
            if (n % 128 == 0
                    and bytes_ <= FUSEDRECOMBINE_RHS_MAX_BYTES
                    and k_dim * keep <= 8192 * 4):
                # dot+recombine fused Pallas kernel in its measured-fast
                # regime: the whole K dimension fits one VMEM-resident
                # rhs slab (KO == 1; the kc guard in dot_recombine).
                # 10.6 vs 14.3 ms/step at the N=1024 bench shape; with a
                # K-loop in the grid the rhs tile changes every cell and
                # the step LOSES to the XLA paths (55.9 vs 73 PBS/s at
                # N=4096 6-bit, RESULTS.md round 3)
                mode = "fusedrecombine"
            elif bytes_ <= FUSED_BANDED_RHS_MAX_BYTES:
                mode = "fuseddot"
            else:
                mode = "planes"
        if mode == "fusedrecombine" and n % 128 == 0:
            # dot + recombine in one Pallas kernel: the int32 limb-product
            # planes never round-trip HBM (ops/pallas_dot_recombine.py)
            from concrete_tpu.ops.pallas_dot_recombine import (
                build_fused_rhs, dot_recombine)
            s_keep = min(keep, 8 + a_limbs_n - 1)
            rhs = build_fused_rhs(w_vv, 128, s_keep, a_limbs=a_limbs_n)
            lhs = lhs_list[0] if a_limbs_n == 1 \
                else jnp.concatenate(lhs_list, axis=1)
            lo2, hi2 = dot_recombine(
                lhs, rhs, lo.reshape(b_ct, kp1 * n),
                hi.reshape(b_ct, kp1 * n), keep=s_keep,
                limb_offset=bsk.truncate_limbs)
            return (lo2.reshape(b_ct * kp1, n),
                    hi2.reshape(b_ct * kp1, n)), None
        if mode == "pallas":
            from concrete_tpu.ops.pallas_banded_mm import banded_matmul_fused
            planes = banded_matmul_fused(lhs_list, w_vv, block)
            planes = planes[:, :, :keep, :]
        elif mode in ("fuseddot", "fusedrecombine"):
            planes = negacyclic_banded_matmul_fused(lhs_list, w_vv, block,
                                                    out_planes=keep)
        else:
            planes = negacyclic_banded_matmul_planes(lhs_list, w_vv, block)
            planes = planes[:, :, :keep, :]
        planes = planes.reshape(b_ct * kp1, keep, n)
        lo2, hi2 = ps.recombine_accumulate(
            planes, lo, hi, limb_offset=bsk.truncate_limbs)
        return (lo2, hi2), None

    (lo, hi), _ = lax.scan(step, (lo0, hi0), (a_t.T, bsk.planes))
    return ps.merge_u64(lo, hi).reshape(b_ct, kp1, n)


def _blind_rotate_xla_latency(ct_small, bsk: LimbBSK, lut_poly,
                              params: CryptoParams):
    """Latency-mode blind rotate for tiny batches (B <= LATENCY_BATCH_MAX).

    The throughput paths Toeplitz-ify the *BSK* step (constant, large):
    per scan step they materialize ~Cin*N*N bytes of band stacks, which at
    B=1 is ~10x the useful traffic and sets a ~1 s single-PBS floor.  Here
    the roles are swapped — negacyclic convolution is symmetric — so the
    band stacks are built from the *rotated-accumulator digits* (tiny:
    Cin x N per ciphertext) and the BSK step becomes the matmul LHS, read
    once per step at its raw size.  Per-step HBM traffic drops from
    ~85 MB to ~B x 10 MB at N=1024 params.

    Bit-identical to _blind_rotate_xla (tests/test_kernels.py).
    """
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    kp1 = k + 1
    switched = modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]
    b_t = switched[:, -1]
    body0 = monomial_mul_rolls(
        _lut_rows(lut_poly, b_ct, n), (2 * n - b_t) % (2 * n))
    acc0 = jnp.zeros((b_ct, kp1, n), dtype=U64).at[:, k, :].set(
        body0[:, 0, :])

    a_limbs_n = lb.num_digit_limbs(params.pbs_base_log)
    block = min(128, n)
    keep = 8 - bsk.truncate_limbs

    def step(acc, xs):
        a_j, w_vv = xs                       # (B,), (Cin, k+1, S, 2N-1)
        rot = monomial_mul_rolls(acc, a_j)
        diff = rot - acc
        digits = decompose(diff, params.pbs_base_log, l)     # (B,k+1,N,l)
        d = jnp.transpose(digits, (0, 3, 1, 2)).reshape(
            b_ct, l * kp1, n)                                # Cin=lev*(k+1)+r
        # negacyclic Toeplitz generator of the digits: d_ext[N-1+y] = d[y]
        # for y >= 0 and -d[N+y] for y < 0 (same construction as pack_bsk,
        # but on signed i32 digits, so negation precedes the limb split)
        ext_d = jnp.concatenate([-d[..., 1:], d], axis=-1)   # (B,Cin,2N-1)
        d_limbs = lb.i32_digits_to_balanced_i8(ext_d, a_limbs_n)
        vv_d = jnp.transpose(d_limbs, (1, 0, 3, 2))          # (Cin,B,A,2N-1)
        # BSK raw values w[j] = vv[N-1+j]; lhs_list[s] = limb-s plane laid
        # out (k+1, Cin*N) so the contraction runs over (cin, j)
        w_raw = w_vv[:, :, :, n - 1:]                        # (Cin,k+1,S,N)
        s_keep = w_raw.shape[2]
        lhs_list = [
            jnp.transpose(w_raw[:, :, s, :], (1, 0, 2)).reshape(kp1, -1)
            for s in range(s_keep)]
        planes = negacyclic_banded_matmul_planes(lhs_list, vv_d, block)
        # (k+1, B, s+a planes, N); plane weights 2^(8*(plane + truncation))
        planes = jnp.transpose(planes, (1, 0, 2, 3))[:, :, :keep, :]
        ext = lb.recombine_i32_planes_to_u64(
            planes, axis=-2, limb_offset=bsk.truncate_limbs)
        return acc + ext, None

    acc, _ = lax.scan(step, acc0, (a_t.T, bsk.planes))
    return acc


def _blind_rotate_xla(ct_small, bsk: LimbBSK, lut_poly, params: CryptoParams):
    """XLA-only variant (CPU tests, reference for the Pallas path)."""
    b_ct = ct_small.shape[0]
    n = params.polynomial_size
    k = params.glwe_dimension
    l = params.pbs_level
    switched = modulus_switch(ct_small, params.log2_polynomial_size)
    a_t = switched[:, :-1]                                   # (B, n_small)
    b_t = switched[:, -1]                                    # (B,)
    # acc = trivial GLWE of X^{-b~} * LUT
    body0 = monomial_mul_rolls(
        _lut_rows(lut_poly, b_ct, n), (2 * n - b_t) % (2 * n))
    acc0 = jnp.zeros((b_ct, k + 1, n), dtype=U64).at[:, k, :].set(
        body0[:, 0, :])

    a_limbs_n = lb.num_digit_limbs(params.pbs_base_log)
    block = min(128, n)

    def step(acc, xs):
        a_j, w_vv = xs                                       # (B,), (Cin, k+1, 8, 2N-1)
        rot = monomial_mul_rolls(acc, a_j)                   # (B, k+1, N)
        diff = rot - acc
        digits = decompose(diff, params.pbs_base_log, l)     # (B, k+1, N, l)
        d_limbs = lb.i32_digits_to_balanced_i8(digits, a_limbs_n)
        # (B, r, N, lev, A) -> (B, Cin=l*(k+1), N, A): Cin = lev * (k+1) + r
        d_limbs = jnp.transpose(d_limbs, (0, 3, 1, 2, 4)).reshape(
            b_ct, l * (k + 1), n, a_limbs_n)
        keep = 8 - bsk.truncate_limbs
        mode = BANDED_MM_MODE
        if mode == "auto":
            mode = "fuseddot" if _fused_rhs_bytes(
                a_limbs_n, l * (k + 1), k + 1, keep,
                n) <= FUSED_BANDED_RHS_MAX_BYTES else "planes"
        if mode == "fusedrecombine":
            # CPU/XLA path has no Pallas epilogue: same math as fuseddot
            mode = "fuseddot"
        if mode == "fuseddot":
            lhs_list = [d_limbs[..., a].reshape(b_ct, l * (k + 1) * n)
                        for a in range(a_limbs_n)]
            planes = negacyclic_banded_matmul_fused(
                lhs_list, w_vv, block, out_planes=keep)
        else:
            planes = negacyclic_banded_matmul(d_limbs, w_vv,
                                              block)[:, :, :keep, :]
        ext = lb.recombine_i32_planes_to_u64(
            planes, axis=-2, limb_offset=bsk.truncate_limbs)
        return acc + ext, None

    acc, _ = lax.scan(step, acc0, (a_t.T, bsk.planes))
    return acc


def sample_extract(acc, index: int = 0):
    """Batched sample extract: (B, k+1, N) u64 -> (B, k*N+1) u64."""
    b_ct, kp1, n = acc.shape
    k = kp1 - 1
    a_polys = acc[:, :k, :]                                  # (B, k, N)
    if index == 0:
        # src = (-t) mod 2N: a'[0] = a[0], a'[t>0] = -a[n-t] — a flip
        # plus one static roll instead of a gather (XLA:TPU lowers
        # per-element gathers to catastrophic VPU loops)
        flipped = jnp.flip(a_polys, axis=-1)                 # a[n-1-t]
        vals = jnp.roll(flipped, 1, axis=-1)                 # a[(n-t)%n]
        neg = (jnp.arange(n, dtype=jnp.int32) >= 1)
        vals = jnp.where(neg, jnp.uint64(0) - vals, vals)
    else:
        t = jnp.arange(n, dtype=jnp.int32)
        src = (index - t) % (2 * n)
        neg = src >= n
        src = jnp.where(neg, src - n, src)
        vals = jnp.take(a_polys, src, axis=-1)
        vals = jnp.where(neg, jnp.uint64(0) - vals, vals)
    a_out = vals.reshape(b_ct, k * n)
    body = acc[:, k, index]
    return jnp.concatenate([a_out, body[:, None]], axis=-1)


# ---------------------------------------------------------------------------
# Full PBS
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("params", "message_bits", "signed"))
def pbs_batch(ct_big, ksk: LimbKSK, bsk, lut_poly,
              params: CryptoParams, message_bits: int, signed: bool = False):
    """Batched programmable bootstrap: (B, n_big+1) u64 -> (B, n_big+1) u64.

    KS -> modswitch -> BR -> sample extract, matching refimpl.pbs bit-for-bit
    (including the signed quarter-torus offset, FHEToTFHEScalar.cpp:395-411).

    `bsk` selects the blind-rotate algorithm: a LimbBSK runs the banded
    int8-matmul path (fastest at N <= 1024); a pallas_fused_ntt.FusedBSK
    runs the single-kernel CRT-NTT external product (the O(N sqrt N) path
    for N >= 2048).  Both are exact and bit-identical.  (The per-stage
    XLA/Pallas CRT-NTT variants were retired in round 4: both lost to
    these at every N and the XLA one crashed the TPU worker; the math
    survives in core/ntt_tpu.py for the limb-sharded multi-chip layout.)
    """
    if signed:
        offset = U64((1 << (message_bits - 1)) << (_Q_LOG - message_bits - 1))
        ct_big = ct_big.at[:, -1].add(offset)
    ct_small = keyswitch(ct_big, ksk)
    acc = blind_rotate(ct_small, bsk, lut_poly, params)
    return sample_extract(acc, 0)
