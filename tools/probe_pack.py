"""Bisect the _combine4 pack-step divergence op by op."""
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
I32, U32 = pn.I32, pn.U32


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

g1_np = planes_np[:, 2 * l_dim:3 * l_dim] + (planes_np[:, 3 * l_dim:] << 8)
u1_np = (g1_np.astype(np.int64) + (1 << 31)).astype(np.uint32)
u1j = jnp.asarray(u1_np)

if sel("g"):
    def body(v):
        g0 = v[:, :l_dim] + (v[:, l_dim:2 * l_dim] << I32(8))
        g1 = v[:, 2 * l_dim:3 * l_dim] + (v[:, 3 * l_dim:] << I32(8))
        return jnp.concatenate([g0, g1], axis=-1)
    f = mk(body, (pj,), jnp.int32, (M * pn.N2, 2 * l_dim))
    cmp("g0/g1 i32 shift-add", f(False), f(True))

if sel("u"):
    def body(v):
        g1 = v[:, 2 * l_dim:3 * l_dim] + (v[:, 3 * l_dim:] << I32(8))
        return jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
    f = mk(body, (pj,), jnp.uint32, (M * pn.N2, l_dim))
    cmp("u1 bitcast+xor", f(False), f(True))

if sel("shl"):
    def body(u1):
        return u1 << U32(16)
    f = mk(body, (u1j,), jnp.uint32, u1_np.shape)
    cmp("u1 << 16 (fed u1)", f(False), f(True))

if sel("shr"):
    def body(u1):
        return pn._shr16(u1)
    f = mk(body, (u1j,), jnp.uint32, u1_np.shape)
    cmp("shr16 (fed u1)", f(False), f(True))

if sel("fused"):
    # the exact pack but from a precomputed u1: is the divergence in the
    # interaction (fusion) of bitcast+xor with the shifts?
    def body(v, u1):
        g0 = v[:, :l_dim] + (v[:, l_dim:2 * l_dim] << I32(8))
        u0 = jax.lax.bitcast_convert_type(g0, U32) ^ U32(1 << 31)
        lo = u0 + (u1 << U32(16))
        c = pn._lt_u32(lo, u0).astype(U32)
        hi = pn._shr16(u1) + c
        return jnp.concatenate([lo, hi], axis=-1)
    f = mk(body, (pj, u1j), jnp.uint32, (M * pn.N2, 2 * l_dim))
    cmp("pack with u1 fed in", f(False), f(True))

if sel("shlg"):
    # u1 computed in-kernel, then shifted — minimal repro candidate
    def body(v):
        g1 = v[:, 2 * l_dim:3 * l_dim] + (v[:, 3 * l_dim:] << I32(8))
        u1 = jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
        return u1 << U32(16)
    f = mk(body, (pj,), jnp.uint32, (M * pn.N2, l_dim))
    cmp("in-kernel u1 << 16", f(False), f(True))

print("probe done", flush=True)
