"""Measure achievable int8 MXU rates for the blind-rotate dot shapes.

The fused banded step's (B x ACinN) @ (ACinN x CoutKeepN) int8->int32 dot
runs at ~113 Tmac/s inside the scan (RESULTS.md round 3: 9.7 ms for the
16384x8192x8192 dot) vs ~200 Tmac/s measured on streamed matmuls in
round 1.  This probe isolates what sets the rate: accumulation dtype,
output width, row count, and operand freshness.

Methodology: every variant consumes ALL output elements through a bitwise
op + full reduction (XLA cannot narrow the dot or push the reduction into
it), chains steps through a genuine carry dependence, and times the
DIFFERENCE between a long and a short chain (cancels dispatch + tunnel RTT
+ fetch).  python tools/probe_dot_rate.py
"""
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
STEPS_LO, STEPS_HI = 8, 40


def _run_factory(m, k, n, in_dtype, acc_dtype, steps, splits=1,
                 consume="full"):
    lhs = jnp.asarray(rng.integers(-100, 100, (m, k)).astype(in_dtype))
    rhs = jnp.asarray(rng.integers(-100, 100, (k, n)).astype(in_dtype))

    @jax.jit
    def run(c, lhs, rhs):
        def body(c, _):
            l = lax.dynamic_update_slice(
                lhs, (c & 1).astype(in_dtype), (0, 0))
            tot = None
            for s in range(splits):
                cols = lax.slice_in_dim(rhs, s * (n // splits),
                                        (s + 1) * (n // splits), axis=1)
                out = jnp.matmul(l, cols, preferred_element_type=acc_dtype)
                if consume == "full":
                    # bitwise + full reduce: forces every output element
                    part = ((out.astype(jnp.int32) >> 7) & 1).sum(
                        axis=1, keepdims=True).astype(jnp.int32)
                else:           # "slice": the DCE-suspect consumption
                    part = out[:, :1].astype(jnp.int32)
                tot = part if tot is None else tot + part
            return c + tot, None
        c, _ = lax.scan(body, c, None, length=steps)
        return c

    c0 = jnp.asarray(rng.integers(0, 1 << 20, (m, 1)).astype(np.int32))
    return run, c0, lhs, rhs


def bench(name, m, k, n, in_dtype, acc_dtype, splits=1, consume="full",
          iters=2):
    times = {}
    for steps in (STEPS_LO, STEPS_HI):
        run, c0, lhs, rhs = _run_factory(m, k, n, in_dtype, acc_dtype,
                                         steps, splits, consume)
        out = run(c0, lhs, rhs)
        int(np.asarray(out[0, 0]))       # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            int(np.asarray(run(c0, lhs, rhs))[0, 0])
            best = min(best, time.time() - t0)
        times[steps] = best
    dt = (times[STEPS_HI] - times[STEPS_LO]) / (STEPS_HI - STEPS_LO)
    tmac = m * k * n / dt / 1e12
    print(f"{name:46s} {dt * 1e3:8.3f} ms/step  {tmac:6.1f} Tmac/s",
          flush=True)
    return dt


def bench_recombine(name, m, k, n, keep=4, iters=2):
    """The real consumer: reshape (m, cout, keep, N) planes and fold them
    into a u32-pair accumulator with carries (kernels.py recombine) — does
    XLA fuse this into the dot (no i32 round-trip) or materialize?"""
    cout = 2
    n_poly = n // (cout * keep)
    times = {}
    for steps in (STEPS_LO, STEPS_HI):
        lhs = jnp.asarray(rng.integers(-100, 100, (m, k)).astype(np.int8))
        rhs = jnp.asarray(rng.integers(-100, 100, (k, n)).astype(np.int8))

        @jax.jit
        def run(lo, hi, lhs, rhs):
            def body(carry, _):
                lo, hi = carry                    # (m, cout*n_poly) u32
                l = lax.dynamic_update_slice(
                    lhs, (lo[:, :1] & 1).astype(jnp.int8), (0, 0))
                out = jnp.matmul(l, rhs, preferred_element_type=jnp.int32)
                p = out.reshape(m, cout, keep, n_poly)
                for s in range(keep):
                    ps_ = p[:, :, s, :].reshape(m, cout * n_poly)
                    pu = jax.lax.bitcast_convert_type(ps_, jnp.uint32)
                    sign = jax.lax.bitcast_convert_type(
                        ps_ >> jnp.int32(31), jnp.uint32)
                    sh = 8 * s
                    lo_c = pu << jnp.uint32(sh) if sh else pu
                    hi_c = ((pu >> jnp.uint32(32 - sh))
                            | (sign << jnp.uint32(sh))) if sh else sign
                    new_lo = lo + lo_c
                    carry_bit = (new_lo < lo_c).astype(jnp.uint32)
                    lo = new_lo
                    hi = hi + hi_c + carry_bit
                return (lo, hi), None
            lo0 = jnp.asarray(rng.integers(0, 1 << 31, (m, cout * n_poly))
                              .astype(np.uint32))
            (lo, hi), _ = lax.scan(body, (lo, hi), None, length=steps)
            return lo, hi
        lo0 = jnp.asarray(rng.integers(0, 1 << 31, (m, cout * n_poly))
                          .astype(np.uint32))
        hi0 = jnp.asarray(rng.integers(0, 1 << 31, (m, cout * n_poly))
                          .astype(np.uint32))
        out = run(lo0, hi0, lhs, rhs)
        int(np.asarray(out[0][0, 0]))
        best = float("inf")
        for _ in range(iters):
            t0 = time.time()
            int(np.asarray(run(lo0, hi0, lhs, rhs)[0][0, 0]))
            best = min(best, time.time() - t0)
        times[steps] = best
    dt = (times[STEPS_HI] - times[STEPS_LO]) / (STEPS_HI - STEPS_LO)
    tmac = m * k * n / dt / 1e12
    print(f"{name:46s} {dt * 1e3:8.3f} ms/step  {tmac:6.1f} Tmac/s",
          flush=True)
    return dt


B, K, N = 16384, 8192, 8192
bench_recombine("prod dot + u32-pair recombine+acc (XLA)", B, K, N)
bench("prod shape int8->int32", B, K, N, np.int8, jnp.int32)
bench("prod shape int8->int32 (slice-consumed)", B, K, N, np.int8,
      jnp.int32, consume="slice")
bench("prod shape int8->bf16 acc", B, K, N, np.int8, jnp.bfloat16)
bench("prod shape bf16->f32", B, K, N, np.dtype(jnp.bfloat16), jnp.float32)
bench("square 8k int8->int32", 8192, 8192, 8192, np.int8, jnp.int32)
bench("prod 2 half-N dots int8->int32", B, K, N, np.int8, jnp.int32,
      splits=2)
bench("prod 4 quarter-N dots int8->int32", B, K, N, np.int8, jnp.int32,
      splits=4)
bench("half-rows int8->int32", B // 2, K, N, np.int8, jnp.int32)
