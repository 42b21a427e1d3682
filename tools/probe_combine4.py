"""Bisect the _combine4 hardware divergence into sub-steps.

Feeds the exact plane inputs the NTT stage-1 kernel produces and dumps
each intermediate (g0/g1 pack, offset pair, REDC pieces) from a hardware
kernel vs interpret mode.  python tools/probe_combine4.py [tags...]
"""
import functools
import sys

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from concrete_tpu import params as pp
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.ops import pallas_ntt as pn

P = pp.BENCH_PARAMS_6BIT
N = P.polynomial_size
primes = nt.choose_primes(P)
p = primes[0]
plan = pn.build_pallas_plan(N, p)
n1 = plan.n1
rng = np.random.default_rng(0)
M = 8
digits = rng.integers(-(1 << 21), 1 << 21, (M, N)).astype(np.int32)
which = set(sys.argv[1:]) or None
_I0 = pn._I0


def sel(tag):
    return which is None or tag in which


def cmp(tag, hw, it):
    hw = np.asarray(hw)
    it = np.asarray(it)
    if np.array_equal(hw, it):
        print(f"{tag}: OK", flush=True)
        return True
    bad = np.argwhere(hw != it)
    i = tuple(bad[0])
    print(f"{tag}: MISMATCH {bad.shape[0]}/{hw.size} first at {i}: "
          f"hw={hw[i]} interp={it[i]}", flush=True)
    return False


def mk(body, args, out_dtype, out_shape):
    """Single-block kernel: o[...] = body(*[r[...] for r in refs])."""
    def k(*refs):
        refs[-1][...] = body(*[r[...] for r in refs[:-1]])

    def f(interpret):
        return pl.pallas_call(
            k, grid=(1,),
            in_specs=[pl.BlockSpec(a.shape, lambda i, _n=len(a.shape):
                                   (_I0,) * _n) for a in args],
            out_specs=pl.BlockSpec(out_shape, lambda i, _n=len(out_shape):
                                   (_I0,) * _n),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
            interpret=interpret)(*args)
    return f


# production-shaped planes: limbs on host, matmul on host (exact int math)
xt = digits.reshape(M * pn.N2, n1)
limb_host = np.zeros((M * pn.N2, 4 * n1), dtype=np.int8)
v = xt.copy()
for i in range(4):
    if i < 3:
        t = v & 0xFF
        carry = (t >= 128).astype(np.int32)
        limb_host[:, i * n1:(i + 1) * n1] = (t - (carry << 8)).astype(np.int8)
        v = (v >> 8) + carry
    else:
        limb_host[:, i * n1:(i + 1) * n1] = v.astype(np.int8)
planes_np = limb_host.astype(np.int32) @ np.asarray(plan.w1f, dtype=np.int32)
pj = jnp.asarray(planes_np)
l_dim = n1

g0_np = planes_np[:, :l_dim] + (planes_np[:, l_dim:2 * l_dim] << 8)
g1_np = planes_np[:, 2 * l_dim:3 * l_dim] + (planes_np[:, 3 * l_dim:] << 8)
u0_np = (g0_np.astype(np.int64) + (1 << 31)).astype(np.uint32)
u1_np = (g1_np.astype(np.int64) + (1 << 31)).astype(np.uint32)
lo_np = (u0_np.astype(np.uint64) + (u1_np.astype(np.uint64) << 16)).astype(
    np.uint32)
c_np = (lo_np < u0_np).astype(np.uint32)
hi_np = (u1_np >> 16).astype(np.uint32) + c_np

if sel("pack"):
    # step 1: i32 shifts/adds + bitcast/xor + u32 pack
    def body(v):
        g0 = v[:, :l_dim] + (v[:, l_dim:2 * l_dim] << pn.I32(8))
        g1 = v[:, 2 * l_dim:3 * l_dim] + (v[:, 3 * l_dim:] << pn.I32(8))
        u0 = jax.lax.bitcast_convert_type(g0, pn.U32) ^ pn.U32(1 << 31)
        u1 = jax.lax.bitcast_convert_type(g1, pn.U32) ^ pn.U32(1 << 31)
        lo = u0 + (u1 << pn.U32(16))
        c = pn._lt_u32(lo, u0).astype(pn.U32)
        hi = pn._shr16(u1) + c
        return jnp.concatenate([lo, hi], axis=-1)
    f = mk(body, (pj,), jnp.uint32, (M * pn.N2, 2 * l_dim))
    hw, it = f(False), f(True)
    cmp("pack lo", np.asarray(hw)[:, :l_dim], np.asarray(it)[:, :l_dim])
    cmp("pack hi", np.asarray(hw)[:, l_dim:], np.asarray(it)[:, l_dim:])
    cmp("pack-vs-np lo", np.asarray(it)[:, :l_dim], lo_np)
    cmp("pack-vs-np hi", np.asarray(it)[:, l_dim:], hi_np)

if sel("redc"):
    # step 2: REDC on the exact (hi, lo) pair from numpy
    his = jnp.asarray(hi_np)
    los = jnp.asarray(lo_np)

    def body(h, l):
        return pn._redc(h, l, plan.p, plan.p_neg_inv)
    f = mk(body, (his, los), jnp.uint32, lo_np.shape)
    cmp("redc", f(False), f(True))

if sel("redcpieces"):
    his = jnp.asarray(hi_np)
    los = jnp.asarray(lo_np)

    def body(h, l):
        m = l * pn.U32(plan.p_neg_inv)
        mp_hi, _ = pn._mul_pair(m, pn.U32(plan.p))
        carry = (l != pn.U32(0)).astype(pn.U32)
        u = h + mp_hi + carry
        red = u - pn.U32(plan.p) * (~pn._lt_u32(u, pn.U32(plan.p))
                                    ).astype(pn.U32)
        return jnp.stack([m, mp_hi, carry, u, red], axis=0)
    f = mk(body, (his, los), jnp.uint32, (5,) + lo_np.shape)
    hw, it = np.asarray(f(False)), np.asarray(f(True))
    for i, tag in enumerate(["m=lo*pninv", "mp_hi", "carry=(lo!=0)",
                             "u=h+mp_hi+c", "condsub"]):
        cmp(f"redc.{tag}", hw[i], it[i])

if sel("sub"):
    # step 3: _sub_mod of redc output and kappa
    y_np = np.asarray(
        mk(lambda h, l: pn._redc(h, l, plan.p, plan.p_neg_inv),
           (jnp.asarray(hi_np), jnp.asarray(lo_np)), jnp.uint32,
           lo_np.shape)(True))
    ys = jnp.asarray(y_np)

    def body(y):
        return pn._sub_mod(y, pn.U32(plan.kappa), plan.p)
    f = mk(body, (ys,), jnp.uint32, y_np.shape)
    cmp("sub_mod kappa", f(False), f(True))

if sel("full"):
    def body(v):
        return pn._combine4(v, plan.p, plan.p_neg_inv, plan.kappa)
    f = mk(body, (pj,), jnp.uint32, (M * pn.N2, l_dim))
    cmp("combine4 full", f(False), f(True))

print("probe done", flush=True)
