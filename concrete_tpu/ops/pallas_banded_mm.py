"""Fused Pallas banded negacyclic matmul for the external product.

The XLA formulation (kernels.negacyclic_banded_matmul) materializes ~100MB of
sliding-window/band stacks in HBM per blind-rotate step — more wall time than
the int8 dots themselves (the MXU sustains ~400 Tops int8 on v5e).  This
kernel builds each band's Toeplitz tile directly in VMEM from the negacyclic
extension vv with a log-shear (7 masked rolls), keeps it in scratch across
all batch tiles of a J-block, and runs the dots in place.

Layouts (matching kernels.negacyclic_banded_matmul_planes):
- lhs_list[a]: (B, Cin*N) int8 digit-limb planes
- vv: (Cin, Cout, S, 2N-1) int8
- out planes: (B, Cout, S + A - 1, N) int32
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

_I0 = np.int32(0)


def _build_rhs(vv_ref, rhs_ref, j_blk, *, cin, cout, s_limbs, nb, block, n):
    """Fill rhs scratch (cin*nb*block, cout*s_limbs*block) for J-block j_blk.

    Band tile (I -> J): T[r, t] = v[(j-I)*block + t - r] with v the
    negacyclic extension; vv_ref[..., i] = v[i - (N-1)].
    One shear chain per cin covers all (I, cout, s) segments at once.
    """
    row_ids = lax.broadcasted_iota(jnp.int32, (block, 1, 1), 0)
    for ci in range(cin):
        for i_blk in range(nb):
            # segment: v[(j-I)*block - r + t] for r,t in [0, block); with
            # vv index = v index + (N-1) (j_blk may be traced):
            base = (j_blk - i_blk) * block + (n - 1) - (block - 1)
            seg = vv_ref[ci, :, :, pl.ds(base, 2 * block)]  # (cout, s, 256)
            m0 = seg.reshape(1, cout * s_limbs, 2 * block)
            m0 = jnp.broadcast_to(
                m0, (block, cout * s_limbs, 2 * block)).astype(jnp.int32)
            # shear: row r shifted right by r -> m[r, :, c] = seg[c - r]
            # (mosaic rotates are 32-bit only, hence the i32 detour)
            for k in range(int(block - 1).bit_length()):
                rolled = pltpu.roll(m0, jnp.int32(1 << k), axis=2)
                take = ((row_ids >> k) & 1) != 0
                m0 = jnp.where(take, rolled, m0)
            t_tile = m0[:, :, block - 1:2 * block - 1].astype(jnp.int8)
            row0 = (ci * nb + i_blk) * block
            rhs_ref[pl.ds(row0, block), :] = t_tile.reshape(
                block, cout * s_limbs * block)


def _mm_kernel(vv_ref, *refs, cin, cout, s_limbs, a_limbs, nb, block, n,
               b_tile):
    lhs_refs = refs[:a_limbs]
    out_ref = refs[a_limbs]
    rhs_ref = refs[a_limbs + 1]
    j_blk = pl.program_id(0)
    bt = pl.program_id(1)

    @pl.when(bt == 0)
    def _():
        _build_rhs(vv_ref, rhs_ref, j_blk, cin=cin, cout=cout,
                   s_limbs=s_limbs, nb=nb, block=block, n=n)

    if a_limbs > 1:
        out_ref[...] = jnp.zeros_like(out_ref)
    for a in range(a_limbs):
        lhs = lhs_refs[a][...]                       # (b_tile, cin*N)
        prod = jnp.dot(lhs, rhs_ref[...],
                       preferred_element_type=jnp.int32)
        prod = prod.reshape(b_tile, cout, s_limbs, block)
        if a_limbs == 1:
            out_ref[...] = prod
        else:
            out_ref[:, :, a:a + s_limbs, :] = (
                out_ref[:, :, a:a + s_limbs, :] + prod)


def banded_matmul_fused(lhs_list, vv, block: int, *, interpret: bool = False,
                        b_tile: int = 128):
    """Drop-in for kernels.negacyclic_banded_matmul_planes, fused in Pallas.

    lhs_list[a]: (B, Cin*N) int8; vv: (Cin, Cout, S, 2N-1) int8.
    Returns (B, Cout, S + A - 1, N) int32.
    """
    a_limbs = len(lhs_list)
    b_ct = lhs_list[0].shape[0]
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = (two_n_m1 + 1) // 2
    nb = n // block
    assert n % block == 0
    tile = min(b_tile, b_ct)
    while b_ct % tile:
        tile //= 2
    # pad vv to 2N so the 256-wide segment slice at the top band stays in
    # bounds (its last element is never read)
    vv = jnp.pad(vv, ((0, 0), (0, 0), (0, 0), (0, 1)))
    s_planes = s_limbs + a_limbs - 1
    kernel = functools.partial(
        _mm_kernel, cin=cin, cout=cout, s_limbs=s_limbs, a_limbs=a_limbs,
        nb=nb, block=block, n=n, b_tile=tile)
    grid = (nb, b_ct // tile)
    lhs_spec = pl.BlockSpec((tile, cin * n), lambda j, b: (b, _I0),
                            memory_space=pltpu.VMEM)
    vv_spec = pl.BlockSpec(tuple(vv.shape),
                           lambda j, b: (_I0, _I0, _I0, _I0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vv_spec] + [lhs_spec] * a_limbs,
        out_specs=pl.BlockSpec((tile, cout, s_planes, block),
                               lambda j, b: (b, _I0, _I0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_ct, cout, s_planes, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((cin * nb * block,
                                    cout * s_limbs * block), jnp.int8)],
        interpret=interpret,
    )(vv, *lhs_list)
    return out
