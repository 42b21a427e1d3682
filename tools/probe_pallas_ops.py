"""Isolate which u32/i8 primitive diverges on TPU inside Pallas kernels.

Runs each arithmetic building block of ops/pallas_ntt.py as its OWN tiny
pallas_call on the device and diffs against a numpy oracle over adversarial
inputs (sign-bit boundaries, 16-bit boundaries, modulus boundaries).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_pallas_ops.py
"""
import functools
import sys

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from concrete_tpu.ops import pallas_ntt as pn

U32 = jnp.uint32
I32 = jnp.int32
P = 2147377153                     # first bench prime (< 2^31)
P_NEG_INV = (-pow(P, -1, 1 << 32)) % (1 << 32)

EDGE = np.array([0, 1, 2, 0xFF, 0x100, 0x7FFF, 0x8000, 0xFFFF, 0x10000,
                 0x7FFFFFFF, 0x80000000, 0x80000001, 0xFFFFFFFE, 0xFFFFFFFF,
                 P - 1, P, P + 1, P // 2, P // 2 + 1, (P - 1) // 2,
                 2 * P - 1, 0x40000000], dtype=np.uint64)
rng = np.random.default_rng(0)


def mk_u32(shape):
    n = int(np.prod(shape))
    vals = np.concatenate([EDGE, rng.integers(0, 1 << 32, max(0, n - len(EDGE)),
                                              dtype=np.uint64)])[:n]
    rng.shuffle(vals)
    return vals.reshape(shape).astype(np.uint32)


def run1(fn, *args, out_dtype=jnp.uint32, n_out=1, out_shape=None):
    """Run fn over whole-array refs in one pallas_call."""
    shape = args[0].shape
    if out_shape is None:
        out_shape = shape

    def kernel(*refs):
        ins = [r[...] for r in refs[:len(args)]]
        outs = fn(*ins)
        if n_out == 1:
            outs = (outs,)
        for o_ref, o in zip(refs[len(args):], outs):
            o_ref[...] = o

    def zmap(s):
        return lambda: tuple(np.int32(0) for _ in s)

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(a.shape, zmap(a.shape)) for a in args],
        out_specs=[pl.BlockSpec(out_shape, zmap(out_shape))
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct(out_shape, out_dtype)
                   for _ in range(n_out)],
        interpret=False,
    )(*args)
    outs = [np.asarray(o) for o in outs]
    return outs if n_out > 1 else outs[0]


def check(name, got, want):
    got, want = np.asarray(got), np.asarray(want)
    ok = np.array_equal(got, want)
    if ok:
        print(f"PASS {name}")
    else:
        bad = np.argwhere(got != want)
        i = tuple(bad[0])
        print(f"FAIL {name}: {bad.shape[0]}/{got.size} wrong; "
              f"first at {i}: got {got[i]:#x} want {want[i]:#x}")
    return ok


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    a = mk_u32((8, 128))
    b = mk_u32((8, 128))
    a64 = a.astype(np.uint64)
    b64 = b.astype(np.uint64)

    # 1. bitcast roundtrip + xor
    check("bitcast u32->i32 (after xor sbit)",
          run1(lambda x: jax.lax.bitcast_convert_type(
              x ^ U32(1 << 31), I32), a, out_dtype=jnp.int32),
          (a ^ np.uint32(1 << 31)).view(np.int32))

    # 2. unsigned compare via sign flip
    check("_lt_u32(a, b)",
          run1(lambda x, y: pn._lt_u32(x, y).astype(U32), a, b),
          (a64 < b64).astype(np.uint32))
    check("_lt_u32(a, const p)",
          run1(lambda x: pn._lt_u32(x, U32(P)).astype(U32), a),
          (a64 < P).astype(np.uint32))

    # 3. shifts
    check("x >> 16 (masked)", run1(pn._shr16, a), (a >> 16) & 0xFFFF)
    check("x << 16", run1(lambda x: x << U32(16), a),
          ((a64 << 16) & 0xFFFFFFFF).astype(np.uint32))

    # 4. u32 multiply: 16x16 partials
    a0, b0 = a & 0xFFFF, b & 0xFFFF
    check("u16*u16 -> u32 mul",
          run1(lambda x, y: (x & U32(0xFFFF)) * (y & U32(0xFFFF)), a, b),
          (a0.astype(np.uint64) * b0).astype(np.uint32))

    # 5. add / sub wraparound
    check("u32 add wrap", run1(lambda x, y: x + y, a, b),
          ((a64 + b64) & 0xFFFFFFFF).astype(np.uint32))
    check("u32 sub wrap", run1(lambda x, y: x - y, a, b),
          ((a64 - b64) & 0xFFFFFFFF).astype(np.uint32))

    # 6. _mul_pair
    def want_mul_pair():
        full = a64 * b64
        return [(full >> 32).astype(np.uint32),
                (full & 0xFFFFFFFF).astype(np.uint32)]

    got = run1(pn._mul_pair, a, b, n_out=2)
    w = want_mul_pair()
    check("_mul_pair hi", got[0], w[0])
    check("_mul_pair lo", got[1], w[1])

    # 7. _redc on t = hi*2^32 + lo < p*2^32 (construct via x*y with x,y<p)
    x = (a64 % P).astype(np.uint32)
    y = (b64 % P).astype(np.uint32)
    full = x.astype(np.uint64) * y
    t_hi = (full >> 32).astype(np.uint32)
    t_lo = (full & 0xFFFFFFFF).astype(np.uint32)
    want_redc = (full % P * pow(pow(2, 32, P), -1, P) % P).astype(np.uint32)
    check("_redc", run1(lambda h, l: pn._redc(h, l, P, P_NEG_INV),
                        t_hi, t_lo), want_redc)

    # 8. _add_mod/_sub_mod on residues
    check("_add_mod", run1(lambda u, v: pn._add_mod(u, v, P), x, y),
          ((x.astype(np.uint64) + y) % P).astype(np.uint32))
    check("_sub_mod", run1(lambda u, v: pn._sub_mod(u, v, P), x, y),
          ((x.astype(np.int64) - y) % P).astype(np.uint32))

    # 9. _center_residues
    check("_center_residues",
          run1(lambda u: pn._center_residues(u, P), x, out_dtype=jnp.int32),
          np.where(x.astype(np.int64) > P // 2,
                   x.astype(np.int64) - P, x.astype(np.int64)
                   ).astype(np.int32))

    # 10. _limbs4_i32 on centered i32
    ci = np.where(x.astype(np.int64) > P // 2, x.astype(np.int64) - P,
                  x.astype(np.int64)).astype(np.int32)
    from concrete_tpu.core import limbs as lb
    want_l = np.concatenate(
        [np.asarray(lb.i32_digits_to_balanced_i8(ci, 4))[..., i]
         for i in range(4)], axis=-1)
    check("_limbs4_i32",
          run1(pn._limbs4_i32, ci, out_dtype=jnp.int8,
               out_shape=(ci.shape[0], 4 * ci.shape[1])), want_l)

    # 11. i8 matmul planes (MXU) with the real stage-1 matrix
    plan = pn.build_pallas_plan(4096, P)
    w1 = np.asarray(plan.w1f)                          # (n1*4, n1*4)
    d = rng.integers(-(1 << 21), 1 << 21, (128, w1.shape[0] // 4)
                     ).astype(np.int32)
    l4 = np.concatenate(
        [np.asarray(lb.i32_digits_to_balanced_i8(d, 4))[..., i]
         for i in range(4)], axis=-1).astype(np.int8)

    def mm_kernel(x_ref, w_ref, o_ref):
        o_ref[...] = pn._matmul_planes(x_ref[...], w_ref[...])

    got_mm = pl.pallas_call(
        mm_kernel,
        in_specs=[pl.BlockSpec(l4.shape, lambda: (np.int32(0), np.int32(0))),
                  pl.BlockSpec(w1.shape, lambda: (np.int32(0), np.int32(0)))],
        out_specs=pl.BlockSpec((l4.shape[0], w1.shape[1]),
                               lambda: (np.int32(0), np.int32(0))),
        out_shape=jax.ShapeDtypeStruct((l4.shape[0], w1.shape[1]),
                                       jnp.int32),
        interpret=False,
    )(jnp.asarray(l4), jnp.asarray(w1))
    want_mm = l4.astype(np.int32) @ w1.astype(np.int32)
    check("_matmul_planes (i8 MXU)", np.asarray(got_mm), want_mm)

    # 12. _combine4 on those planes
    def c4_kernel(p_ref, o_ref):
        o_ref[...] = pn._combine4(p_ref[...], plan.p, plan.p_neg_inv,
                                  plan.kappa)

    got_c4 = pl.pallas_call(
        c4_kernel,
        in_specs=[pl.BlockSpec(want_mm.shape,
                               lambda: (np.int32(0), np.int32(0)))],
        out_specs=pl.BlockSpec((want_mm.shape[0], want_mm.shape[1] // 4),
                               lambda: (np.int32(0), np.int32(0))),
        out_shape=jax.ShapeDtypeStruct(
            (want_mm.shape[0], want_mm.shape[1] // 4), jnp.uint32),
        interpret=False,
    )(jnp.asarray(want_mm))
    l_dim = want_mm.shape[1] // 4
    v = (want_mm[:, :l_dim].astype(np.int64)
         + (want_mm[:, l_dim:2 * l_dim].astype(np.int64) << 8)
         + (want_mm[:, 2 * l_dim:3 * l_dim].astype(np.int64) << 16)
         + (want_mm[:, 3 * l_dim:].astype(np.int64) << 24))
    want_c4 = (v % P * pow(pow(2, 32, P), -1, P) % P).astype(np.uint32)
    check("_combine4", np.asarray(got_c4), want_c4)

    # 13. swapaxes/reshape shuffle used by _k_fwd1 (one way, no roundtrip)
    t = mk_u32((8, 32, 128))
    check("swapaxes+reshape (R,n1,n2)->(R*n2,n1)",
          run1(lambda u: jnp.swapaxes(u, 1, 2).reshape(8 * 128, 32), t,
               out_shape=(8 * 128, 32)),
          np.swapaxes(t, 1, 2).reshape(8 * 128, 32))
    check("reshape+swapaxes (R*n2,n1)->(R,n1,n2)",
          run1(lambda u: jnp.swapaxes(
              u.reshape(8 * 128, 32).reshape(8, 128, 32), 1, 2),
              t.reshape(8, 128, 32), out_shape=(8, 32, 128)),
          np.swapaxes(t.reshape(8, 128, 32), 1, 2),)

    # 12b. drill into _combine4 intermediates (u0/u1/lo/c/hi + redc + sub)
    def c4_steps(planes):
        l_d = planes.shape[-1] // 4
        g0 = planes[:, :l_d] + (planes[:, l_d:2 * l_d] << I32(8))
        g1 = planes[:, 2 * l_d:3 * l_d] + (planes[:, 3 * l_d:] << I32(8))
        u0 = jax.lax.bitcast_convert_type(g0, U32) ^ U32(1 << 31)
        u1 = jax.lax.bitcast_convert_type(g1, U32) ^ U32(1 << 31)
        lo = u0 + (u1 << U32(16))
        c = pn._lt_u32(lo, u0).astype(U32)
        hi = pn._shr16(u1) + c
        y = pn._redc(hi, lo, plan.p, plan.p_neg_inv)
        out = pn._sub_mod(y, U32(plan.kappa), plan.p)
        return u0, u1, lo, c, hi, y, out

    got_steps = run1(c4_steps, want_mm.astype(np.int32), n_out=7,
                     out_shape=(want_mm.shape[0], want_mm.shape[1] // 4))
    pm = want_mm.astype(np.int64)
    g0_h = pm[:, :l_dim] + (pm[:, l_dim:2 * l_dim] << 8)
    g1_h = pm[:, 2 * l_dim:3 * l_dim] + (pm[:, 3 * l_dim:] << 8)
    u0_h = ((g0_h + (1 << 31)) & 0xFFFFFFFF).astype(np.uint64)
    u1_h = ((g1_h + (1 << 31)) & 0xFFFFFFFF).astype(np.uint64)
    lo_h = (u0_h + (u1_h << 16)) & 0xFFFFFFFF
    c_h = (lo_h < u0_h).astype(np.uint64)
    hi_h = (u1_h >> 16) + c_h
    t_full = (hi_h << 32) + lo_h
    y_h2 = (t_full % P) * pow(pow(2, 32, P), -1, P) % P
    out_h = (y_h2 - plan.kappa) % P
    names = ["u0", "u1", "lo", "carry", "hi", "redc", "out"]
    wants = [u0_h, u1_h, lo_h, c_h, hi_h, y_h2, out_h]
    for nm, g, w in zip(names, got_steps, wants):
        check(f"_combine4 step {nm}", g, w.astype(np.uint32))

    # 14. the full _k_fwd1 kernel body on one block (no grid), vs numpy
    n1 = plan.n1
    d14 = rng.integers(-(1 << 21), 1 << 21, (8, n1, 128)).astype(np.int32)

    def fwd1_body(x):
        r, _n1, _n2 = x.shape
        xt = jnp.swapaxes(x, 1, 2).reshape(r * _n2, _n1)
        limbs = pn._limbs4_i32(xt)
        planes = pn._matmul_planes(limbs, jnp.asarray(np.asarray(plan.w1f)))
        y = pn._combine4(planes, plan.p, plan.p_neg_inv, plan.kappa)
        return jnp.swapaxes(y.reshape(r, _n2, _n1), 1, 2)

    xt_h = np.swapaxes(d14, 1, 2).reshape(8 * 128, n1).astype(np.int64)
    l_h = np.concatenate(
        [np.asarray(lb.i32_digits_to_balanced_i8(xt_h.astype(np.int32), 4)
                    )[..., i] for i in range(4)], axis=-1)
    pl_h = l_h.astype(np.int64) @ np.asarray(plan.w1f).astype(np.int64)
    l_dim2 = pl_h.shape[1] // 4
    v_h = (pl_h[:, :l_dim2] + (pl_h[:, l_dim2:2 * l_dim2] << 8)
           + (pl_h[:, 2 * l_dim2:3 * l_dim2] << 16)
           + (pl_h[:, 3 * l_dim2:] << 24))
    y_h = (v_h % P * pow(pow(2, 32, P), -1, P) % P).astype(np.uint32)
    want14 = np.swapaxes(y_h.reshape(8, 128, n1), 1, 2)
    check("_k_fwd1 body (1 block)",
          run1(fwd1_body, d14, out_shape=(8, n1, 128)), want14)
    print("done", flush=True)


if __name__ == "__main__":
    main()
