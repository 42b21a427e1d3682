"""Find a hardware-correct formulation of ((g1 + 2^31) << 16) mod 2^32
where g1 is an in-kernel i32 chain.  python tools/probe_shl_variants.py
"""
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
p = nt.choose_primes(P)[0]
plan = pn.build_pallas_plan(N, p)
n1 = plan.n1
rng = np.random.default_rng(0)
M = 8
digits = rng.integers(-(1 << 21), 1 << 21, (M, N)).astype(np.int32)
_I0 = pn._I0
I32, U32 = pn.I32, pn.U32
which = set(sys.argv[1:]) or None


def cmp(tag, hw, it):
    hw, it = np.asarray(hw), np.asarray(it)
    if np.array_equal(hw, it):
        print(f"{tag}: OK", flush=True)
        return True
    bad = np.argwhere(hw != it)
    i = tuple(bad[0])
    print(f"{tag}: MISMATCH {bad.shape[0]}/{hw.size} at {i}: "
          f"hw={hw[i]} interp={it[i]} (g1={g1_np[i]})", flush=True)
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
want = ((g1_np.astype(np.int64) + (1 << 31)) << 16).astype(np.uint32)


def g1_of(v):
    return v[:, 2 * l_dim:3 * l_dim] + (v[:, 3 * l_dim:] << I32(8))


VARIANTS = {
    # original: bitcast -> xor -> u32 shl
    "v1_xor_shl": lambda v: (jax.lax.bitcast_convert_type(g1_of(v), U32)
                             ^ U32(1 << 31)) << U32(16),
    # i32 shl then bitcast (offset bit shifts out)
    "v2_i32shl": lambda v: jax.lax.bitcast_convert_type(
        g1_of(v) << I32(16), U32),
    # mask low 16 in i32, then shl, then bitcast
    "v3_mask_shl": lambda v: jax.lax.bitcast_convert_type(
        (g1_of(v) & I32(0xFFFF)) << I32(16), U32),
    # u32 mask then shl
    "v4_u32mask": lambda v: ((jax.lax.bitcast_convert_type(g1_of(v), U32)
                              & U32(0xFFFF)) << U32(16)),
    # u32 multiply by 65536
    "v5_u32mul": lambda v: (jax.lax.bitcast_convert_type(g1_of(v), U32)
                            ^ U32(1 << 31)) * U32(1 << 16),
    # i32 multiply then bitcast
    "v6_i32mul": lambda v: jax.lax.bitcast_convert_type(
        g1_of(v) * I32(1 << 16), U32),
}

for tag, body in VARIANTS.items():
    if which and tag not in which:
        continue
    f = mk(body, (pj,), jnp.uint32, (M * pn.N2, l_dim))
    try:
        hw, it = f(False), f(True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: ERROR {type(e).__name__}: {e}", flush=True)
        continue
    ok_i = np.array_equal(np.asarray(it), want)
    cmp(tag + ("" if ok_i else " [interp!=np]"), hw, it)

print("probe done", flush=True)
