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
            acc_ref, *, keep: int, limb_offset: int, n_ko: int):
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
        p = acc_ref[...]                         # (TB, keep*BLOCK) int32
        lo = lo_ref[...]                         # (TB, BLOCK) u32
        hi = hi_ref[...]
        for s in range(keep):
            ps = p[:, s * BLOCK:(s + 1) * BLOCK]
            pu = lax.bitcast_convert_type(ps, jnp.uint32)
            sign = lax.bitcast_convert_type(ps >> jnp.int32(31), jnp.uint32)
            sh = 8 * (s + limb_offset)
            if sh == 0:
                lo_c, hi_c = pu, sign
            elif sh < 32:
                # left shifts as multiplies: Mosaic's vector shl-by-16
                # lowering miscompiles in-kernel chains (round-3 bisection)
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
        out_lo_ref[...] = lo
        out_hi_ref[...] = hi


def dot_recombine(lhs, rhs, acc_lo, acc_hi, *, keep: int,
                  limb_offset: int = 0, block_b: int = 256,
                  block_k: int = 8192, jo_outer: bool = True,
                  parallel_dims: bool = False,
                  interpret: bool = False):
    """acc' = acc + recombine(lhs @ rhs) without materializing the planes.

    lhs (B, K) i8, rhs (K, J*keep*128) i8 (build_fused_rhs layout),
    acc_lo/hi (B, J*128) u32.  Returns the updated (lo, hi) pair.

    jo_outer: iterate output-column tiles outermost so the (K, keep*128)
    rhs slab stays VMEM-resident across the whole batch sweep (the rhs is
    the only operand small enough to pin; with io outermost it re-streams
    per batch tile — 4 GB/step at the bench shape).  Defaults measured on
    hardware (tools/sweep_dot_recombine.py).
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
    # 16 MB scoped-VMEM envelope: (tb=256, kc=8192, keep=4) is measured to
    # compile; the rhs slab (kc * keep * 128 i8, double-buffered) is the
    # dominant term, so scale kc down when keep grows (untruncated/WoP
    # keysets run keep up to 8)
    while kc > 512 and kc * keep > 8192 * 4:
        kc //= 2
    n_ko = k_dim // kc

    kernel = functools.partial(_kernel, keep=keep,
                               limb_offset=limb_offset, n_ko=n_ko)
    if jo_outer:
        grid = (jo, b_ct // tb, n_ko)
        io_ix, jo_ix = (lambda j, io, ko: io), (lambda j, io, ko: j)
        ko_ix = lambda j, io, ko: ko
    else:
        grid = (b_ct // tb, jo, n_ko)
        io_ix, jo_ix = (lambda io, j, ko: io), (lambda io, j, ko: j)
        ko_ix = lambda io, j, ko: ko
    pair_spec = pl.BlockSpec(
        (tb, BLOCK), lambda *g: (io_ix(*g), jo_ix(*g)),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, kc), lambda *g: (io_ix(*g), ko_ix(*g)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kc, keep * BLOCK),
                         lambda *g: (ko_ix(*g), jo_ix(*g)),
                         memory_space=pltpu.VMEM),
            pair_spec,
            pair_spec,
        ],
        out_specs=(pair_spec, pair_spec),
        out_shape=(jax.ShapeDtypeStruct((b_ct, jo * BLOCK), U32),
                   jax.ShapeDtypeStruct((b_ct, jo * BLOCK), U32)),
        scratch_shapes=[pltpu.VMEM((tb, keep * BLOCK), jnp.int32)],
        # in the KO==1 regime every (j, io) cell is independent, so the
        # two outer grid dims can be declared parallel (Mosaic may
        # pipeline/overlap across cells); ko accumulates in scratch and
        # stays arbitrary
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
                if parallel_dims and n_ko == 1
                else ("arbitrary", "arbitrary", "arbitrary"))),
        interpret=interpret,
    )(lhs, rhs, acc_lo, acc_hi)
