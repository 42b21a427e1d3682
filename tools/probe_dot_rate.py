"""Measure achievable int8 MXU rates for the blind-rotate dot shapes.

The fused banded step's (B x ACinN) @ (ACinN x CoutKeepN) int8->int32 dot
runs at ~115-130 effective Tops inside the scan (RESULTS.md round 3) vs
~390-420 Tops measured on streamed matmuls in round 1.  This probe
isolates what sets the rate: shape, accumulation dtype, scan context, and
operand freshness.  python tools/probe_dot_rate.py
"""
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

rng = np.random.default_rng(0)
STEPS = 4


def bench_scan(name, m, k, n, in_dtype, acc_dtype, iters=3):
    """Dot chained through a scan with a genuine carry dependence: the
    carry perturbs one lhs column, the output feeds the next carry."""
    lhs = jnp.asarray(rng.integers(-100, 100, (m, k)).astype(in_dtype))
    rhs = jnp.asarray(rng.integers(-100, 100, (k, n)).astype(in_dtype))
    c0 = jnp.asarray(rng.integers(0, 1 << 20, (m, 1)).astype(np.int32))

    @jax.jit
    def run(c, lhs, rhs):
        def body(c, _):
            l = lax.dynamic_update_slice(
                lhs, (c & 1).astype(in_dtype), (0, 0))
            out = jnp.matmul(l, rhs, preferred_element_type=acc_dtype)
            return c + out[:, :1].astype(jnp.int32), None
        c, _ = lax.scan(body, c, None, length=STEPS)
        return c

    out = run(c0, lhs, rhs)
    int(np.asarray(out[0, 0]))
    t0 = time.time()
    for _ in range(iters):
        int(np.asarray(run(c0, lhs, rhs))[0, 0])
    dt = ((time.time() - t0) / iters - 0.030) / STEPS
    tops = 2 * m * k * n / dt / 1e12 / 2   # MAC/s -> "Tops" as mul+add/2
    print(f"{name:46s} {dt * 1e3:8.3f} ms/step  "
          f"{m * k * n / dt / 1e12:6.1f} Tmac/s", flush=True)
    return dt


B, K, N = 16384, 8192, 8192
bench_scan("prod shape int8->int32", B, K, N, np.int8, jnp.int32)
bench_scan("prod shape int8->bf16 acc", B, K, N, np.int8, jnp.bfloat16)
bench_scan("square 8k int8->int32", 8192, 8192, 8192, np.int8, jnp.int32)
bench_scan("prod shape bf16->f32", B, K, N, np.dtype(jnp.bfloat16),
           jnp.float32)
bench_scan("half-N cols int8->int32", B, K, N // 2, np.int8, jnp.int32)
bench_scan("quarter-rows int8->int32", B // 4, K, N, np.int8, jnp.int32)
