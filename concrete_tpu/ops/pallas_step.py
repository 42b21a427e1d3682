"""Pallas kernels for the blind-rotate step's elementwise phases.

The accumulator lives as two u32 planes (lo, hi) across the whole scan; these
kernels implement, entirely in 32-bit VPU arithmetic (TPUs have no 64-bit
datapath — XLA's x64 emulation of the same ops costs ~10x):

- rotate_decompose_limbs: negacyclic monomial rotation (log-shear of masked
  static rolls), rot - acc difference, balanced gadget decomposition, and
  int8 limb split — one VMEM-resident pass.
- recombine_accumulate: shift-add the int32 limb-product planes back into the
  (lo, hi) accumulator with carry propagation.

Semantics match core/refimpl.py exactly (tests compare bit-for-bit against
the XLA path which is itself oracle-exact).
"""

from __future__ import annotations

import functools

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_I0 = np.int32(0)  # index-map literal; python 0 traces to i64 under x64


def _v_shift_right(hi, lo, s: int):
    """(hi:lo) u32 pair >> s (logical), result's low 32 bits, for s in [0,64)."""
    if s == 0:
        return lo
    if s < 32:
        return (lo >> U32(s)) | (hi << U32(32 - s))
    if s == 32:
        return hi
    return hi >> U32(s - 32)


def _bit_of_v(hi, lo, pos: int):
    """Bit `pos` of the u64 value (hi:lo) as u32 {0,1}."""
    if pos < 32:
        return (lo >> U32(pos)) & U32(1)
    return (hi >> U32(pos - 32)) & U32(1)


def _w_mod32(hi, lo, j: int, base_log: int):
    """w_j mod 2^32 where w_j = round_half_up(v / 2^(64 - j*b)).

    w_j = ((v >> (s-1)) + 1) >> 1 with s = 64 - j*b; computed mod 2^32 with
    explicit carry into bit 32 (t == 0xFFFFFFFF) and the true bit 32 of the
    pre-increment shift.
    """
    if j == 0:
        # s = 64: w_0 = top bit of v
        return hi >> U32(31)
    s = 64 - j * base_log
    t = _v_shift_right(hi, lo, s - 1)
    u = t + U32(1)
    ov = (t == U32(0xFFFFFFFF)).astype(U32)
    if s - 1 + 32 < 64:
        bit32 = _bit_of_v(hi, lo, s - 1 + 32)
    else:
        bit32 = U32(0)
    msb = bit32 ^ ov
    return (u >> U32(1)) | (msb << U32(31))


def _digits_i32(hi, lo, base_log: int, levels: int):
    """Balanced gadget digits d_1..d_l as signed int32 (list)."""
    ws = [_w_mod32(hi, lo, j, base_log) for j in range(levels + 1)]
    out = []
    for j in range(1, levels + 1):
        d = ws[j] - (ws[j - 1] << U32(base_log))
        out.append(jax.lax.bitcast_convert_type(d, jnp.int32))
    return out


def digits_lo_free(base_log: int, levels: int) -> bool:
    """True when the gadget digits depend only on the accumulator's HIGH
    u32 word: every w_j (j <= levels) reads v >> (s-1) with
    s - 1 = 63 - j*b >= 32 and its bit32 probe sits at >= 64, i.e.
    levels * base_log <= 31.  This is the condition for the hi-only
    accumulator mode (acc lo identically zero when the kept product
    planes all land at shifts >= 32 — see dot_recombine_hi)."""
    return levels * base_log <= 31


def _digits_i32_hi(hi, base_log: int, levels: int):
    """_digits_i32 for a lo-free decomposition (digits_lo_free must hold);
    the lo plane is never materialized."""
    assert digits_lo_free(base_log, levels), (base_log, levels)

    def w(j):
        if j == 0:
            return hi >> U32(31)
        s = 64 - j * base_log
        t = hi >> U32(s - 33)
        u = t + U32(1)
        ov = (t == U32(0xFFFFFFFF)).astype(U32)
        return (u >> U32(1)) | (ov << U32(31))

    ws = [w(j) for j in range(levels + 1)]
    out = []
    for j in range(1, levels + 1):
        d = ws[j] - (ws[j - 1] << U32(base_log))
        out.append(jax.lax.bitcast_convert_type(d, jnp.int32))
    return out


def _digit_limbs_i8(d, num_limbs: int):
    """Balanced base-256 int8 limbs of small signed int32 digits (list)."""
    limbs = []
    v = d
    for i in range(num_limbs):
        if i < num_limbs - 1:
            byte = v & jnp.int32(0xFF)
            carry = (byte >= jnp.int32(128)).astype(jnp.int32)
            byte = byte - (carry << jnp.int32(8))
            v = (v >> jnp.int32(8)) + carry
        else:
            byte = v
        limbs.append(byte.astype(jnp.int8))
    return limbs


def _rotate_kernel(a_ref, lo_ref, hi_ref, *dl_refs,
                   n: int, base_log: int, levels: int, a_limbs: int):
    """One batch-row tile: rotate by a, subtract, decompose, limb-split.

    a_ref: (Rt, 1) int32 rotations in [0, 2N)
    lo/hi_ref: (Rt, N) u32 accumulator planes
    dl_refs: levels * a_limbs outputs of (Rt, N) int8 (index = lev*A + limb)
    """
    lo = lo_ref[...]
    hi = hi_ref[...]
    a = a_ref[...]                                  # (Rt, 1), in [0, 2N)
    # roll on width N only (pltpu.roll is out[i] = in[i - shift]); the
    # wrapped-in prefix i < a mod N crossed the negacyclic boundary once,
    # and a >= N is a global X^N = -1 factor — half the roll work of the
    # former [x, -x] concat on width 2N
    a_mod = a & jnp.int32(n - 1)
    s_bit = (a >> jnp.int32(int(n).bit_length() - 1)) & 1
    r_lo, r_hi = lo, hi
    for b in range(int(n - 1).bit_length()):
        take = ((a_mod >> b) & 1) != 0              # (Rt, 1) bool
        shift = jnp.int32(1 << b)  # mosaic dynamic_rotate requires i32
        rl = pltpu.roll(r_lo, shift, axis=1)
        rh = pltpu.roll(r_hi, shift, axis=1)
        r_lo = jnp.where(take, rl, r_lo)
        r_hi = jnp.where(take, rh, r_hi)
    col = jax.lax.broadcasted_iota(jnp.int32, r_lo.shape, 1)
    flip = (col < a_mod) ^ (s_bit != 0)             # (Rt, N) bool
    neg_lo = U32(0) - r_lo
    borrow = (r_lo != U32(0)).astype(U32)
    neg_hi = U32(0) - r_hi - borrow
    rot_lo = jnp.where(flip, neg_lo, r_lo)
    rot_hi = jnp.where(flip, neg_hi, r_hi)
    # diff = rot - acc  (u64 pair subtraction)
    d_lo = rot_lo - lo
    bw = (rot_lo < lo).astype(U32)
    d_hi = rot_hi - hi - bw
    digits = _digits_i32(d_hi, d_lo, base_log, levels)
    for lev, dig in enumerate(digits):
        for limb, byte in enumerate(_digit_limbs_i8(dig, a_limbs)):
            dl_refs[lev * a_limbs + limb][...] = byte


def rotate_decompose_limbs(acc_lo, acc_hi, a_rows, *, base_log: int,
                           levels: int, a_limbs: int, row_tile: int = None,
                           interpret: bool = False):
    """rows = B*(k+1) flattened; returns a tuple of levels*a_limbs int8
    planes of shape (rows, N), index = lev * a_limbs + limb.

    acc planes: (rows, N) u32; a_rows: (rows,) int32.
    """
    rows, n = acc_lo.shape
    if row_tile is None:
        # the kernel keeps ~4 (tile, 2N) u32 arrays live; stay under ~8MB
        row_tile = max(32, 1 << (int(12e6 / (32 * n)).bit_length() - 1))
    tile = min(row_tile, rows)
    while rows % tile:
        tile //= 2
    grid = (rows // tile,)
    kernel = functools.partial(_rotate_kernel, n=n, base_log=base_log,
                               levels=levels, a_limbs=a_limbs)
    n_out = levels * a_limbs
    plane_spec = pl.BlockSpec((tile, n), lambda i: (i, _I0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            plane_spec,
            plane_spec,
        ],
        out_specs=tuple(plane_spec for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, n), jnp.int8)
                        for _ in range(n_out)),
        interpret=interpret,
    )(a_rows.reshape(rows, 1), acc_lo, acc_hi)


def rotate_diff_digits_hi(hi, a, *, n: int, base_log: int, levels: int):
    """rotate_diff_digits for the hi-only accumulator mode: the u64
    accumulator is v = hi * 2^32 exactly (lo identically zero), so the
    negacyclic negation is exact in one plane (-(h*2^32) =
    ((2^32 - h) mod 2^32) * 2^32 — no borrow), the difference is a single
    u32 subtract, and the decomposition reads hi only
    (digits_lo_free(base_log, levels) must hold).  Half the roll/select
    work of the pair version — the rolls were pure waste on a zero lo.
    """
    a_mod = a & jnp.int32(n - 1)
    s_bit = (a >> jnp.int32(int(n).bit_length() - 1)) & 1
    r_hi = hi
    for b in range(int(n - 1).bit_length()):
        take = ((a_mod >> b) & 1) != 0
        shift = jnp.int32(1 << b)
        rh = pltpu.roll(r_hi, shift, axis=1)
        r_hi = jnp.where(take, rh, r_hi)
    col = jax.lax.broadcasted_iota(jnp.int32, r_hi.shape, 1)
    flip = (col < a_mod) ^ (s_bit != 0)
    rot_hi = jnp.where(flip, U32(0) - r_hi, r_hi)
    d_hi = rot_hi - hi
    return _digits_i32_hi(d_hi, base_log, levels)


def rotate_diff_digits(lo, hi, a, *, n: int, base_log: int, levels: int):
    """Negacyclic rotate-by-a, subtract, balanced gadget decompose — on
    VALUES (u32 pair planes), shared by the standalone kernel below and
    the fused CRT-NTT step kernel (ops/pallas_fused_ntt.py).

    lo/hi: (M, N) u32 accumulator planes; a: (M, 1) int32 in [0, 2N).
    Returns `levels` signed int32 digit arrays of shape (M, N).
    """
    a_mod = a & jnp.int32(n - 1)
    s_bit = (a >> jnp.int32(int(n).bit_length() - 1)) & 1
    r_lo, r_hi = lo, hi
    for b in range(int(n - 1).bit_length()):
        take = ((a_mod >> b) & 1) != 0
        shift = jnp.int32(1 << b)
        rl = pltpu.roll(r_lo, shift, axis=1)
        rh = pltpu.roll(r_hi, shift, axis=1)
        r_lo = jnp.where(take, rl, r_lo)
        r_hi = jnp.where(take, rh, r_hi)
    col = jax.lax.broadcasted_iota(jnp.int32, r_lo.shape, 1)
    flip = (col < a_mod) ^ (s_bit != 0)
    neg_lo = U32(0) - r_lo
    borrow = (r_lo != U32(0)).astype(U32)
    neg_hi = U32(0) - r_hi - borrow
    rot_lo = jnp.where(flip, neg_lo, r_lo)
    rot_hi = jnp.where(flip, neg_hi, r_hi)
    d_lo = rot_lo - lo
    bw = (rot_lo < lo).astype(U32)
    d_hi = rot_hi - hi - bw
    return _digits_i32(d_hi, d_lo, base_log, levels)


def _rotate_kernel_hi(a_ref, hi_ref, *dl_refs,
                      n: int, base_log: int, levels: int, a_limbs: int):
    """_rotate_kernel for the hi-only accumulator mode."""
    digits = rotate_diff_digits_hi(hi_ref[...], a_ref[...], n=n,
                                   base_log=base_log, levels=levels)
    for lev, dig in enumerate(digits):
        for limb, byte in enumerate(_digit_limbs_i8(dig, a_limbs)):
            dl_refs[lev * a_limbs + limb][...] = byte


def rotate_decompose_limbs_hi(acc_hi, a_rows, *, base_log: int,
                              levels: int, a_limbs: int,
                              row_tile: int = None,
                              interpret: bool = False):
    """rotate_decompose_limbs on a hi-only accumulator plane."""
    rows, n = acc_hi.shape
    if row_tile is None:
        row_tile = max(32, 1 << (int(12e6 / (32 * n)).bit_length() - 1))
    tile = min(row_tile, rows)
    while rows % tile:
        tile //= 2
    grid = (rows // tile,)
    kernel = functools.partial(_rotate_kernel_hi, n=n, base_log=base_log,
                               levels=levels, a_limbs=a_limbs)
    n_out = levels * a_limbs
    plane_spec = pl.BlockSpec((tile, n), lambda i: (i, _I0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            plane_spec,
        ],
        out_specs=tuple(plane_spec for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, n), jnp.int8)
                        for _ in range(n_out)),
        interpret=interpret,
    )(a_rows.reshape(rows, 1), acc_hi)


def _rotate_digits_kernel(a_ref, lo_ref, hi_ref, *d_refs,
                          n: int, base_log: int, levels: int):
    """_rotate_kernel without the int8 limb split: emits the signed int32
    gadget digits themselves (the CRT-NTT path's input).

    a_ref: (Rt, 1) int32 rotations in [0, 2N)
    lo/hi_ref: (Rt, N) u32 accumulator planes
    d_refs: `levels` outputs of (Rt, N) int32 (index = lev)
    """
    digits = rotate_diff_digits(lo_ref[...], hi_ref[...], a_ref[...],
                                n=n, base_log=base_log, levels=levels)
    for lev, dig in enumerate(digits):
        d_refs[lev][...] = dig


def rotate_decompose_digits(acc_lo, acc_hi, a_rows, *, base_log: int,
                            levels: int, row_tile: int = None,
                            interpret: bool = False):
    """rows = B*(k+1) flattened; returns a tuple of `levels` int32 digit
    planes of shape (rows, N) — the balanced gadget digits of
    (X^a * acc - acc), for the CRT-NTT external product."""
    rows, n = acc_lo.shape
    if row_tile is None:
        row_tile = max(32, 1 << (int(12e6 / (32 * n)).bit_length() - 1))
    tile = min(row_tile, rows)
    while rows % tile:
        tile //= 2
    grid = (rows // tile,)
    kernel = functools.partial(_rotate_digits_kernel, n=n,
                               base_log=base_log, levels=levels)
    plane_spec = pl.BlockSpec((tile, n), lambda i: (i, _I0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            plane_spec,
            plane_spec,
        ],
        out_specs=tuple(plane_spec for _ in range(levels)),
        out_shape=tuple(jax.ShapeDtypeStruct((rows, n), jnp.int32)
                        for _ in range(levels)),
        interpret=interpret,
    )(a_rows.reshape(rows, 1), acc_lo, acc_hi)


def _recombine_kernel(planes_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref,
                      *, keep: int, limb_offset: int):
    """Accumulate planes[s] << 8*(s + limb_offset) into (lo, hi) pairs.

    planes_ref: (Rt, keep, N) int32; lo/hi: (Rt, N) u32.
    """
    lo = lo_ref[...]
    hi = hi_ref[...]
    for s in range(keep):
        sh = 8 * (s + limb_offset)
        p = planes_ref[:, s, :]
        pu = p.astype(U32)
        sign = (p >> jnp.int32(31)).astype(U32)   # 0 or 0xFFFFFFFF
        if sh == 0:
            lo_c, hi_c = pu, sign
        elif sh < 32:
            lo_c = pu << U32(sh)
            hi_c = (pu >> U32(32 - sh)) | (sign << U32(sh))
        elif sh == 32:
            lo_c, hi_c = U32(0), pu
        else:
            lo_c, hi_c = U32(0), pu << U32(sh - 32)
        new_lo = lo + lo_c
        carry = (new_lo < lo_c).astype(U32)
        lo = new_lo
        hi = hi + hi_c + carry
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def recombine_accumulate(planes, acc_lo, acc_hi, *, limb_offset: int = 0,
                         row_tile: int = None, interpret: bool = False):
    """planes: (rows, S, N) int32 (S = planes kept); acc: (rows, N) u32.

    Returns updated (acc_lo, acc_hi) with
    acc += sum_s planes[:, s] << 8*(s + limb_offset)  (mod 2^64).
    """
    rows, keep, n = planes.shape
    if row_tile is None:
        # live: planes (tile, keep, N) i32 + 4x (tile, N) u32 (~8MB budget)
        row_tile = max(32, 1 << (int(6e6 / (4 * (keep + 4) * n))
                                 .bit_length() - 1))
    tile = min(row_tile, rows)
    while rows % tile:
        tile //= 2
    grid = (rows // tile,)
    kernel = functools.partial(_recombine_kernel, keep=keep,
                               limb_offset=limb_offset)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, keep, n), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((rows, n), U32),
                   jax.ShapeDtypeStruct((rows, n), U32)),
        interpret=interpret,
    )(planes, acc_lo, acc_hi)


def split_u64(x):
    """u64 array -> (lo, hi) u32 planes."""
    return ((x & jnp.uint64(0xFFFFFFFF)).astype(U32),
            (x >> jnp.uint64(32)).astype(U32))


def merge_u64(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
