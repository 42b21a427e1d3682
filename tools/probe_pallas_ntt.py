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


_FAILED = []


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
    _FAILED.append(tag)
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
    cmp("A fwd-stage1", y_hw, y_it)

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


def mk1(body, x, out_dtype, out_shape=None, *extra):
    """Single-block kernel: o[...] = body(x_ref[...], *extra_refs[...]).
    Extra operands are passed as real kernel inputs (pallas rejects
    captured array constants)."""
    out_shape = out_shape or x.shape
    args = (x,) + extra

    def k(*refs):
        refs[-1][...] = body(*[r[...] for r in refs[:-1]])

    def f(interpret):
        return pl.pallas_call(
            k, grid=(1,),
            in_specs=[pl.BlockSpec(a.shape, lambda i, _n=len(a.shape):
                                   (_I0,) * _n) for a in args],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda i, _n=len(out_shape):
                                   (_I0,) * _n),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
            interpret=interpret)(*args)
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
    # production-range inputs: the same +-2^21 gadget digits stage A uses
    # (4 active limbs) — a small-range probe would mask magnitude-dependent
    # MXU divergence.  Keep the small-range case as a separate tag.
    for tag, xt in [("matmul_planes[prod]",
                     jnp.asarray(digits.reshape(M * pn.N2, n1))),
                    ("matmul_planes[small]",
                     jnp.asarray(digits.reshape(M * pn.N2, n1) % 251,
                                 dtype=jnp.int32) - 125)]:
        limb_host = np.asarray(
            mk1(pn._limbs4_i32, xt, jnp.int8, (M * pn.N2, 4 * n1))(True))
        li = jnp.asarray(limb_host)
        f = mk1(pn._matmul_planes, li, jnp.int32, (M * pn.N2, 4 * n1),
                plan.w1f)
        cmp(tag, f(False), f(True))

if sel("comb"):
    xt = jnp.asarray(digits.reshape(M * pn.N2, n1))
    limb_it = mk1(pn._limbs4_i32, xt, jnp.int8, (M * pn.N2, 4 * n1))(True)
    # plain integer matmul — numpy is exact here, no jit needed
    planes = np.asarray(limb_it, dtype=np.int32) @ np.asarray(
        plan.w1f, dtype=np.int32)
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

    def body(av, bv):
        return pn._mont_mul(av, bv, plan.p, plan.p_neg_inv)
    f = mk1(body, a, jnp.uint32, None, b)
    cmp("mont_mul", f(False), f(True))

if sel("center"):
    a = jnp.asarray(rng.integers(0, p, (8, 256), dtype=np.uint64)
                    .astype(np.uint32))

    def body(v):
        return pn._center_residues(v, plan.p)
    f = mk1(body, a, jnp.int32)
    cmp("center_residues", f(False), f(True))

print("probe done" + (f" ({len(_FAILED)} FAILED: {_FAILED})"
                      if _FAILED else ""), flush=True)
sys.exit(1 if _FAILED else 0)
