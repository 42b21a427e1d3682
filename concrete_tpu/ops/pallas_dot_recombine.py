"""Fused int8 matmul + u32-pair recombine-accumulate for the banded step.

The shipped fused-dot blind-rotate step (kernels._blind_rotate_pallas with
BANDED_MM_MODE=fuseddot) runs three serialized phases per scan step:
rotate/decompose (Pallas), one big int8 dot (XLA), recombine/accumulate
(Pallas).  The dot writes its (B, Cout, keep, N) int32 limb-product planes
to HBM (512 MB at the bench shape) and the recombine kernel reads them
right back — ~1 GB of avoidable traffic per step; tools/probe_dot_rate.py
measured the same dot at 153 Tmac/s when its consumer fuses into the
epilogue vs 113 Tmac/s as shipped.

This kernel runs the dot as a Pallas tiled matmul whose epilogue folds the
int32 planes straight into the (lo, hi) u32 accumulator pair in VMEM —
the planes never exist in HBM:

  lhs     (B, K) int8            K = A*Cin*N digit limb planes
  rhs     (K, J*keep*128) int8   columns ordered (j, s, t): j enumerates
                                 (cout, jblk) pairs, s the kept limb
                                 planes, t the 128 columns of one N-block
  lo/hi   (B, J*128) u32         the (B*(k+1), N) scan carry viewed as
                                 (B, (k+1)*N) — row-contiguous reshape
  out     lo/hi updated with sum_s planes_s << 8*(s + limb_offset) mod 2^64

Grid (io, jo, ko), ko innermost: the (TB, keep*128) int32 accumulator
lives in VMEM scratch across the K reduction; at ko == last the epilogue
recombines and writes the (TB, 128) output block.  Left shifts are
multiplies (the round-3 Mosaic shl-16 miscompile, tools/probe_shl_variants
.py); the u32 carry compare is the pallas_step.py hardware-validated
idiom.

Semantics match ps.recombine_accumulate(negacyclic_banded_matmul_fused(..))
bit-for-bit (tests/test_pallas_dot_recombine.py).
"""

from __future__ import annotations

import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_I0 = np.int32(0)
BLOCK = 128


def build_fused_rhs(vv, block: int, keep: int, a_limbs: int = 1):
    """Toeplitz-band rhs with columns ordered (cout, jblk, s, t).

    Same static slice-stack construction as
    kernels.negacyclic_banded_matmul_fused (measured 0.45 ms at the bench
    shape vs 12.5 ms for a take-based gather), transposed so each 128-col
    output block carries all `keep` limb planes contiguously — the layout
    the epilogue needs.  For a_limbs > 1 the digit-limb plane shift is
    embedded in zero-padded row copies, matching the (B, A*Cin*N) lhs of
    concatenated digit-limb planes.

    vv: (Cin, Cout, S, 2N-1) int8 -> (A*Cin*N, Cout*nb*keep*block) int8.
    """
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = (two_n_m1 + 1) // 2
    nb = n // block
    assert n % block == 0
    width = (2 * nb - 1) * block
    m = jnp.stack([
        lax.slice_in_dim(vv, block - 1 - r, block - 1 - r + width, axis=-1)
        for r in range(block)], axis=1)          # (Cin, r, Cout, S, width)
    rows = []
    for i_blk in range(nb):
        band = jnp.stack([
            lax.slice_in_dim(m, (j_blk - i_blk + nb - 1) * block,
                             (j_blk - i_blk + nb - 1) * block + block,
                             axis=-1)
            for j_blk in range(nb)], axis=-2)    # (Cin, r, Cout, S, nb_j, t)
        rows.append(band)
    rhs = jnp.stack(rows, axis=1)                # (Cin, nb_i, r, Cout, S, nb_j, t)
    rhs = rhs.reshape(cin * n, cout, s_limbs, nb, block)
    s_total = s_limbs + a_limbs - 1
    out_planes = min(keep, s_total)
    if a_limbs == 1:
        rhs = rhs[:, :, :out_planes, :, :]
    else:
        # digit limb a contributes at product planes shifted by a
        pads = []
        for a in range(a_limbs):
            padded = jnp.pad(rhs, ((0, 0), (0, 0),
                                   (a, s_total - s_limbs - a),
                                   (0, 0), (0, 0)))
            pads.append(padded[:, :, :out_planes, :, :])
        rhs = jnp.stack(pads, axis=0).reshape(
            a_limbs * cin * n, cout, out_planes, nb, block)
    # (rows, cout, s, jblk, t) -> (rows, cout, jblk, s, t)
    rhs = jnp.transpose(rhs, (0, 1, 3, 2, 4))
    return rhs.reshape(a_limbs * cin * n, cout * nb * out_planes * block)


def _kernel(lhs_ref, rhs_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref,
            acc_ref, *, keep: int, limb_offset: int, n_ko: int,
            j_group: int):
    ko = pl.program_id(2)

    prod = jnp.dot(lhs_ref[...], rhs_ref[...],
                   preferred_element_type=jnp.int32)

    @pl.when(ko == 0)
    def _():
        acc_ref[...] = prod

    @pl.when(ko != 0)
    def _():
        acc_ref[...] += prod

    @pl.when(ko == n_ko - 1)
    def _():
        p = acc_ref[...]                 # (TB, j_group*keep*BLOCK) int32
        for jg in range(j_group):
            cols = slice(jg * BLOCK, (jg + 1) * BLOCK)
            lo = lo_ref[:, cols]         # (TB, BLOCK) u32
            hi = hi_ref[:, cols]
            for s in range(keep):
                c0 = (jg * keep + s) * BLOCK
                ps = p[:, c0:c0 + BLOCK]
                pu = lax.bitcast_convert_type(ps, jnp.uint32)
                sign = lax.bitcast_convert_type(ps >> jnp.int32(31),
                                                jnp.uint32)
                sh = 8 * (s + limb_offset)
                if sh == 0:
                    lo_c, hi_c = pu, sign
                elif sh < 32:
                    # left shifts as multiplies: Mosaic's vector shl-by-16
                    # lowering miscompiles in-kernel chains (round-3
                    # bisection)
                    lo_c = pu * U32(1 << sh)
                    hi_c = (pu >> U32(32 - sh)) | (sign * U32(1 << sh))
                elif sh == 32:
                    lo_c, hi_c = U32(0) * pu, pu
                else:
                    lo_c, hi_c = U32(0) * pu, pu * U32(1 << (sh - 32))
                new_lo = lo + lo_c
                carry = (new_lo < lo_c).astype(U32)
                lo = new_lo
                hi = hi + hi_c + carry
            out_lo_ref[:, cols] = lo
            out_hi_ref[:, cols] = hi


def _kernel_hi(*refs, keep: int, limb_offset: int, n_ko: int,
               j_group: int, n_lhs: int):
    """_kernel for the hi-only accumulator mode (8*limb_offset >= 32):
    every kept plane lands at a shift >= 32, so its contribution to the
    u64 accumulator is (plane * 2^sh mod 2^64) = hi-word
    pu * 2^(sh-32) mod 2^32 with a ZERO low word — no lo chain, no
    carries, sign handled by the u32 wrap.  Exact (not approximate)
    whenever the initial accumulator's low word is zero.

    The lhs may arrive as n_lhs separate row-segment arrays (each
    (TB, K/n_lhs), contracting against consecutive rhs row ranges) — the
    caller then skips the XLA concatenation copy of the digit planes
    (~135 MB/step at the N=1024 bench shape)."""
    lhs_refs = refs[:n_lhs]
    rhs_ref, hi_ref, out_hi_ref, acc_ref = refs[n_lhs:]
    ko = pl.program_id(2)

    seg = rhs_ref.shape[0] // n_lhs
    prod = None
    for i, lref in enumerate(lhs_refs):
        part = jnp.dot(lref[...], rhs_ref[i * seg:(i + 1) * seg, :],
                       preferred_element_type=jnp.int32)
        prod = part if prod is None else prod + part

    @pl.when(ko == 0)
    def _():
        acc_ref[...] = prod

    @pl.when(ko != 0)
    def _():
        acc_ref[...] += prod

    @pl.when(ko == n_ko - 1)
    def _():
        p = acc_ref[...]
        for jg in range(j_group):
            cols = slice(jg * BLOCK, (jg + 1) * BLOCK)
            hi = hi_ref[:, cols]
            for s in range(keep):
                sh = 8 * (s + limb_offset)
                assert sh >= 32
                if sh >= 64:
                    continue                     # contributes 0 mod 2^64
                c0 = (jg * keep + s) * BLOCK
                pu = lax.bitcast_convert_type(p[:, c0:c0 + BLOCK],
                                              jnp.uint32)
                hi = hi + pu * U32(1 << (sh - 32))
            out_hi_ref[:, cols] = hi


def dot_recombine_hi(lhs, rhs, acc_hi, *, keep: int, limb_offset: int,
                     block_b: int = 512, block_k: int = 8192,
                     j_group: int = None, parallel_dims: bool = False,
                     interpret: bool = False):
    """dot_recombine on a hi-only accumulator plane (see _kernel_hi).
    Requires 8 * limb_offset >= 32.

    lhs: a single (B, K) int8 array, or a LIST of (B, K/len) row-segment
    arrays contracting against consecutive rhs row ranges (the caller
    avoids concatenating the per-level digit planes).  Segmented lhs
    requires the whole K dimension in one block (n_ko == 1 — true for
    every shipped shape; the kc guard below enforces the same bound).
    """
    assert 8 * limb_offset >= 32, limb_offset
    lhs_list = lhs if isinstance(lhs, (list, tuple)) else [lhs]
    n_lhs = len(lhs_list)
    b_ct = lhs_list[0].shape[0]
    k_dim = sum(x.shape[1] for x in lhs_list)
    n_cols = rhs.shape[1]
    assert rhs.shape[0] == k_dim
    assert n_cols % (keep * BLOCK) == 0
    jo = n_cols // (keep * BLOCK)
    assert acc_hi.shape == (b_ct, jo * BLOCK), (acc_hi.shape, jo)

    tb = min(block_b, b_ct)
    while b_ct % tb:
        tb //= 2
    kc = min(block_k, k_dim)
    while k_dim % kc:
        kc //= 2
    while kc > 512 and kc * keep > 8192 * 4:
        kc //= 2
    n_ko = k_dim // kc
    if n_lhs > 1:
        assert n_ko == 1, (k_dim, kc, "segmented lhs needs full-K blocks")
        kc_seg = k_dim // n_lhs
        assert all(x.shape[1] == kc_seg for x in lhs_list)
    if j_group is None:
        j_group = 1
        while (jo % (j_group * 2) == 0
               and kc * (j_group * 2) * keep * BLOCK <= (8 << 20)):
            j_group *= 2
    while jo % j_group:
        j_group //= 2
    n_jo = jo // j_group

    kernel = functools.partial(_kernel_hi, keep=keep,
                               limb_offset=limb_offset, n_ko=n_ko,
                               j_group=j_group, n_lhs=n_lhs)
    grid = (n_jo, b_ct // tb, n_ko)
    pair_spec = pl.BlockSpec(
        (tb, j_group * BLOCK), lambda j, io, ko: (io, j),
        memory_space=pltpu.VMEM)
    vmem_est = (2 * (kc * j_group * keep * BLOCK + tb * kc)
                + 4 * tb * j_group * keep * BLOCK
                + 8 * tb * j_group * BLOCK)
    lhs_specs = [
        pl.BlockSpec((tb, x.shape[1] if n_lhs > 1 else kc),
                     lambda j, io, ko: (io, ko),
                     memory_space=pltpu.VMEM)
        for x in lhs_list]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            *lhs_specs,
            pl.BlockSpec((kc, j_group * keep * BLOCK),
                         lambda j, io, ko: (ko, j),
                         memory_space=pltpu.VMEM),
            pair_spec,
        ],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((b_ct, jo * BLOCK), U32),
        scratch_shapes=[pltpu.VMEM((tb, j_group * keep * BLOCK),
                                   jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
                if parallel_dims and n_ko == 1
                else ("arbitrary", "arbitrary", "arbitrary")),
            vmem_limit_bytes=max(16 << 20, int(1.8 * vmem_est))),
        interpret=interpret,
    )(*lhs_list, rhs, acc_hi)


def dot_recombine(lhs, rhs, acc_lo, acc_hi, *, keep: int,
                  limb_offset: int = 0, block_b: int = 256,
                  block_k: int = 8192, jo_outer: bool = True,
                  parallel_dims: bool = False, j_group: int = None,
                  interpret: bool = False):
    """acc' = acc + recombine(lhs @ rhs) without materializing the planes.

    lhs (B, K) i8, rhs (K, J*keep*128) i8 (build_fused_rhs layout),
    acc_lo/hi (B, J*128) u32.  Returns the updated (lo, hi) pair.

    jo_outer: iterate output-column tiles outermost so the (K, keep*128)
    rhs slab stays VMEM-resident across the whole batch sweep (the rhs is
    the only operand small enough to pin; with io outermost it re-streams
    per batch tile — 4 GB/step at the bench shape).  Defaults measured on
    hardware (tools/sweep_dot_recombine.py).

    j_group: output-column tiles processed per grid cell.  The lhs block
    streams from HBM once per (io, j) cell, so at j_group=1 the whole lhs
    re-streams J times per step (2.1 GB/step at the N=1024 bench shape —
    the round-4 VERDICT's 107-153-vs-400 Tmac/s gap is mostly this
    stream); grouping g output tiles multiplies the per-cell arithmetic
    intensity by g at the cost of a g-times-larger rhs slab + epilogue
    accumulator in VMEM.  Default: largest divisor of J whose rhs slab
    stays under ~8 MB (hardware-measured sweet spot,
    tools/sweep_dot_recombine.py round 5).
    """
    b_ct, k_dim = lhs.shape
    n_cols = rhs.shape[1]
    assert rhs.shape[0] == k_dim
    assert n_cols % (keep * BLOCK) == 0
    jo = n_cols // (keep * BLOCK)
    assert acc_lo.shape == (b_ct, jo * BLOCK), (acc_lo.shape, jo)

    tb = min(block_b, b_ct)
    while b_ct % tb:
        tb //= 2
    kc = min(block_k, k_dim)
    while k_dim % kc:
        kc //= 2
    # VMEM envelope: the rhs slab (kc * j_group * keep * 128 i8,
    # double-buffered) is the dominant term, so scale kc down when keep
    # grows (untruncated/WoP keysets run keep up to 8)
    while kc > 512 and kc * keep > 8192 * 4:
        kc //= 2
    n_ko = k_dim // kc
    if j_group is None:
        j_group = 1
        while (jo % (j_group * 2) == 0
               and kc * (j_group * 2) * keep * BLOCK <= (8 << 20)):
            j_group *= 2
    while jo % j_group:
        j_group //= 2
    n_jo = jo // j_group

    kernel = functools.partial(_kernel, keep=keep,
                               limb_offset=limb_offset, n_ko=n_ko,
                               j_group=j_group)
    if jo_outer:
        grid = (n_jo, b_ct // tb, n_ko)
        io_ix, jo_ix = (lambda j, io, ko: io), (lambda j, io, ko: j)
        ko_ix = lambda j, io, ko: ko
    else:
        grid = (b_ct // tb, n_jo, n_ko)
        io_ix, jo_ix = (lambda io, j, ko: io), (lambda io, j, ko: j)
        ko_ix = lambda io, j, ko: ko
    pair_spec = pl.BlockSpec(
        (tb, j_group * BLOCK), lambda *g: (io_ix(*g), jo_ix(*g)),
        memory_space=pltpu.VMEM)
    # scoped-VMEM bound: rhs + lhs double-buffered, accumulator scratch,
    # 4 acc pair blocks in+out
    vmem_est = (2 * (kc * j_group * keep * BLOCK + tb * kc)
                + 4 * tb * j_group * keep * BLOCK
                + 16 * tb * j_group * BLOCK)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, kc), lambda *g: (io_ix(*g), ko_ix(*g)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, j_group * keep * BLOCK),
                         lambda *g: (ko_ix(*g), jo_ix(*g)),
                         memory_space=pltpu.VMEM),
            pair_spec,
            pair_spec,
        ],
        out_specs=(pair_spec, pair_spec),
        out_shape=(jax.ShapeDtypeStruct((b_ct, jo * BLOCK), U32),
                   jax.ShapeDtypeStruct((b_ct, jo * BLOCK), U32)),
        scratch_shapes=[pltpu.VMEM((tb, j_group * keep * BLOCK),
                                   jnp.int32)],
        # in the KO==1 regime every (j, io) cell is independent, so the
        # two outer grid dims can be declared parallel (Mosaic may
        # pipeline/overlap across cells); ko accumulates in scratch and
        # stays arbitrary
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
                if parallel_dims and n_ko == 1
                else ("arbitrary", "arbitrary", "arbitrary")),
            vmem_limit_bytes=max(16 << 20, int(1.25 * vmem_est)),
        ),
        interpret=interpret,
    )(lhs, rhs, acc_lo, acc_hi)
