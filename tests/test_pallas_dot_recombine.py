"""Bit-exactness of the fused dot+recombine kernel (interpret mode) against
the shipped composition: negacyclic_banded_matmul_fused -> planes ->
pallas_step.recombine_accumulate."""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401
import jax.numpy as jnp

from concrete_tpu.core import kernels as kn
from concrete_tpu.ops import pallas_dot_recombine as pdr
from concrete_tpu.ops import pallas_step as ps

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("j_group", [1, 2, None])
@pytest.mark.parametrize("limb_offset", [0, 4])
@pytest.mark.parametrize("cin,cout,keep,n,b", [
    (8, 2, 4, 256, 16),
    (4, 2, 3, 128, 8),
])
def test_dot_recombine_matches_shipped(cin, cout, keep, n, b, limb_offset,
                                       j_group):
    block = min(128, n)
    vv = RNG.integers(-128, 128, (cin, cout, 8, 2 * n - 1)).astype(np.int8)
    lhs = RNG.integers(-128, 128, (b, cin * n)).astype(np.int8)
    acc = RNG.integers(0, 1 << 63, (b * cout, n), dtype=np.uint64)
    lo, hi = ps.split_u64(jnp.asarray(acc))

    # shipped: fused dot -> int32 planes in HBM -> Pallas recombine
    planes = kn.negacyclic_banded_matmul_fused(
        [jnp.asarray(lhs)], jnp.asarray(vv), block, out_planes=keep)
    lo_ref, hi_ref = ps.recombine_accumulate(
        planes.reshape(b * cout, keep, n), lo, hi,
        limb_offset=limb_offset, interpret=True)

    # fused: the planes never leave VMEM
    rhs = pdr.build_fused_rhs(jnp.asarray(vv), block, keep)
    lo2, hi2 = pdr.dot_recombine(
        jnp.asarray(lhs), rhs,
        lo.reshape(b, cout * n), hi.reshape(b, cout * n),
        keep=keep, limb_offset=limb_offset, block_b=8, block_k=128,
        j_group=j_group, interpret=True)

    assert np.array_equal(np.asarray(lo_ref),
                          np.asarray(lo2).reshape(b * cout, n))
    assert np.array_equal(np.asarray(hi_ref),
                          np.asarray(hi2).reshape(b * cout, n))


@pytest.mark.parametrize("a_limbs", [2, 3])
def test_dot_recombine_multi_limb_digits(a_limbs):
    """A > 1 digit limbs (wide-base gadgets, e.g. 6-bit N=4096 params):
    the limb shift embedded in the rhs row copies matches the shipped
    fused-dot + recombine composition."""
    cin, cout, n, b = 4, 2, 128, 8
    keep = 5
    block = min(128, n)
    vv = RNG.integers(-128, 128, (cin, cout, 8, 2 * n - 1)).astype(np.int8)
    lhs_list = [jnp.asarray(RNG.integers(-128, 128, (b, cin * n))
                            .astype(np.int8)) for _ in range(a_limbs)]
    acc = RNG.integers(0, 1 << 63, (b * cout, n), dtype=np.uint64)
    lo, hi = ps.split_u64(jnp.asarray(acc))

    planes = kn.negacyclic_banded_matmul_fused(
        lhs_list, jnp.asarray(vv), block, out_planes=keep)
    lo_ref, hi_ref = ps.recombine_accumulate(
        planes.reshape(b * cout, keep, n), lo, hi,
        limb_offset=3, interpret=True)

    rhs = pdr.build_fused_rhs(jnp.asarray(vv), block, keep,
                              a_limbs=a_limbs)
    lo2, hi2 = pdr.dot_recombine(
        jnp.concatenate(lhs_list, axis=1), rhs,
        lo.reshape(b, cout * n), hi.reshape(b, cout * n),
        keep=keep, limb_offset=3, block_b=8, block_k=cin * n,
        interpret=True)
    assert np.array_equal(np.asarray(lo_ref),
                          np.asarray(lo2).reshape(b * cout, n))
    assert np.array_equal(np.asarray(hi_ref),
                          np.asarray(hi2).reshape(b * cout, n))


@pytest.mark.parametrize("segmented", [False, True])
def test_dot_recombine_hi_matches_pair(segmented):
    """Hi-only kernel == pair kernel with a zero low plane when every
    kept plane lands at shift >= 32 (limb_offset 4), for both the single
    and the segmented lhs forms."""
    cin, cout, keep, n, b = 8, 2, 4, 256, 16
    limb_offset = 4
    block = min(128, n)
    vv = RNG.integers(-128, 128, (cin, cout, 8, 2 * n - 1)).astype(np.int8)
    lhs = RNG.integers(-128, 128, (b, cin * n)).astype(np.int8)
    acc_hi = RNG.integers(0, 1 << 32, (b * cout, n)).astype(np.uint32)
    lo = jnp.zeros((b, cout * n), dtype=jnp.uint32)
    hi2d = jnp.asarray(acc_hi).reshape(b, cout * n)

    rhs = pdr.build_fused_rhs(jnp.asarray(vv), block, keep)
    _, hi_ref = pdr.dot_recombine(
        jnp.asarray(lhs), rhs, lo, hi2d,
        keep=keep, limb_offset=limb_offset, block_b=8, block_k=cin * n,
        interpret=True)
    lhs_in = ([jnp.asarray(lhs[:, i * 2 * n:(i + 1) * 2 * n])
               for i in range(cin // 2)] if segmented
              else jnp.asarray(lhs))
    got = pdr.dot_recombine_hi(
        lhs_in, rhs, hi2d, keep=keep, limb_offset=limb_offset,
        block_b=8, block_k=cin * n, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(hi_ref))


def test_build_fused_rhs_is_column_permutation():
    """The new rhs is the fused builder's rhs with (s, jblk) transposed."""
    cin, cout, keep, n = 4, 2, 4, 256
    block = 128
    nb = n // block
    vv = RNG.integers(-128, 128, (cin, cout, 8, 2 * n - 1)).astype(np.int8)
    lhs = RNG.integers(-128, 128, (3, cin * n)).astype(np.int8)
    old = np.asarray(kn.negacyclic_banded_matmul_fused(
        [jnp.asarray(lhs)], jnp.asarray(vv), block, out_planes=keep))
    rhs = pdr.build_fused_rhs(jnp.asarray(vv), block, keep)
    new = (lhs.astype(np.int32) @ np.asarray(rhs, dtype=np.int32)).reshape(
        3, cout, nb, keep, block)
    assert np.array_equal(np.transpose(new, (0, 1, 3, 2, 4)).reshape(
        3, cout, keep, n), old)
