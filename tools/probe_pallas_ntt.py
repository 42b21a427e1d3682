"""Bisect the Pallas NTT hardware divergence: run each kernel and each
in-kernel primitive on the real TPU vs interpret mode and report the first
mismatch.  Run stages selectively: python tools/probe_pallas_ntt.py [a b c ...]
"""
import functools
import sys

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from concrete_tpu import params as pp
from concrete_tpu.core import ntt as ntt_host
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


_I0 = pn._I0


def run_k(kernel, grid, in_specs, out_specs, out_shape, args, interpret):
    return pl.pallas_call(kernel, grid=grid, in_specs=in_specs,
                          out_specs=out_specs, out_shape=out_shape,
                          interpret=interpret)(*args)


# ---- stage A: fwd stage-1 kernel alone ------------------------------------
if sel("a"):
    x3 = jnp.asarray(digits.reshape(M, n1, pn.N2))
    f = functools.partial(
        run_k, functools.partial(pn._k_fwd1, plan), (1,),
        [pl.BlockSpec((M, n1, pn.N2), lambda i: (_I0, _I0, _I0)),
         pl.BlockSpec((n1 * 4, n1 * 4), lambda i: (_I0, _I0))],
        pl.BlockSpec((M, n1, pn.N2), lambda i: (_I0, _I0, _I0)),
        jax.ShapeDtypeStruct((M, n1, pn.N2), jnp.uint32),
        (x3, plan.w1f))
    y_hw = f(interpret=False)
    y_it = f(interpret=True)
    ok = cmp("A fwd-stage1", y_hw, y_it)

# ---- stage B: stage-2 kernel alone (on interpret stage-1 output) ----------
if sel("b"):
    x3 = jnp.asarray(digits.reshape(M, n1, pn.N2))
    y_it = pl.pallas_call(
        functools.partial(pn._k_fwd1, plan), grid=(1,),
        in_specs=[pl.BlockSpec((M, n1, pn.N2), lambda i: (_I0, _I0, _I0)),
                  pl.BlockSpec((n1 * 4, n1 * 4), lambda i: (_I0, _I0))],
        out_specs=pl.BlockSpec((M, n1, pn.N2), lambda i: (_I0, _I0, _I0)),
        out_shape=jax.ShapeDtypeStruct((M, n1, pn.N2), jnp.uint32),
        interpret=True)(x3, plan.w1f)
    s_hw = pn._stage2(y_it, plan.w2f, plan, interpret=False)
    s_it = pn._stage2(y_it, plan.w2f, plan, interpret=True)
    cmp("B fwd-stage2", s_hw, s_it)

# ---- primitive probes inside one-block kernels -----------------------------
x2 = digits[:, :n1]  # (M, n1) i32 small


def mk1(body, x, out_dtype, out_shape=None):
    """Single-block kernel: o[...] = body(x_ref[...])."""
    out_shape = out_shape or x.shape

    def k(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    def f(interpret):
        return pl.pallas_call(
            k, grid=(1,),
            in_specs=[pl.BlockSpec(x.shape,
                                   lambda i: (_I0,) * len(x.shape))],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda i: (_I0,) * len(out_shape)),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
            interpret=interpret)(x)
    return f


if sel("limbs"):
    xt = jnp.asarray(digits)  # (M, N) i32, |d| < 2^21
    f = mk1(pn._limbs4_i32, xt, jnp.int8, (M, 4 * N))
    cmp("limbs4", f(False), f(True))

if sel("swap"):
    x3 = jnp.asarray(digits.reshape(M, n1, pn.N2))

    def body(v):
        r, a, b = v.shape
        return jnp.swapaxes(v, 1, 2).reshape(r * b, a)
    f = mk1(body, x3, jnp.int32, (M * pn.N2, n1))
    cmp("swapaxes+reshape", f(False), f(True))

if sel("mm"):
    xt = jnp.asarray(digits.reshape(M * pn.N2, n1) % 251,
                     dtype=jnp.int32) - 125
    limb_host = np.asarray(
        mk1(pn._limbs4_i32, xt, jnp.int8, (M * pn.N2, 4 * n1))(True))
    li = jnp.asarray(limb_host)

    def body(v):
        return pn._matmul_planes(v, plan.w1f)
    f = mk1(body, li, jnp.int32, (M * pn.N2, 4 * n1))
    cmp("matmul_planes", f(False), f(True))

if sel("comb"):
    xt = jnp.asarray(digits.reshape(M * pn.N2, n1))
    limb_it = mk1(pn._limbs4_i32, xt, jnp.int8, (M * pn.N2, 4 * n1))(True)
    planes = np.asarray(jax.jit(pn._matmul_planes, backend="cpu")(
        np.asarray(limb_it), np.asarray(plan.w1f)))
    pj = jnp.asarray(planes)

    def body(v):
        return pn._combine4(v, plan.p, plan.p_neg_inv, plan.kappa)
    f = mk1(body, pj, jnp.uint32, (M * pn.N2, n1))
    cmp("combine4", f(False), f(True))

if sel("mul"):
    a = jnp.asarray(rng.integers(0, 1 << 32, (8, 256), dtype=np.uint64)
                    .astype(np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, (8, 256), dtype=np.uint64)
                    .astype(np.uint32))

    def k(a_ref, b_ref, h_ref, l_ref):
        h, l = pn._mul_pair(a_ref[...], b_ref[...])
        h_ref[...] = h
        l_ref[...] = l

    def f(interpret):
        return pl.pallas_call(
            k, grid=(1,),
            in_specs=[pl.BlockSpec((8, 256), lambda i: (_I0, _I0))] * 2,
            out_specs=[pl.BlockSpec((8, 256), lambda i: (_I0, _I0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.uint32)] * 2,
            interpret=interpret)(a, b)
    h_hw, l_hw = f(False)
    h_it, l_it = f(True)
    cmp("mul_pair hi", h_hw, h_it)
    cmp("mul_pair lo", l_hw, l_it)

if sel("redc"):
    a = jnp.asarray(rng.integers(0, 1 << 32, (8, 256), dtype=np.uint64)
                    .astype(np.uint32))
    b = jnp.asarray((rng.integers(0, p, (8, 256), dtype=np.uint64)
                     * pow(2, 32, p) % p).astype(np.uint32))

    def body(v):
        return pn._mont_mul(v, b, plan.p, plan.p_neg_inv)
    f = mk1(body, a, jnp.uint32)
    cmp("mont_mul", f(False), f(True))

if sel("center"):
    a = jnp.asarray(rng.integers(0, p, (8, 256), dtype=np.uint64)
                    .astype(np.uint32))

    def body(v):
        return pn._center_residues(v, plan.p)
    f = mk1(body, a, jnp.int32)
    cmp("center_residues", f(False), f(True))

print("probe done", flush=True)
