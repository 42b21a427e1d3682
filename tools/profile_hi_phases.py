"""Phase split of the hi-only (acc32) banded blind-rotate step on TPU.

Times rotate_decompose_limbs_hi and dot_recombine_hi in isolation at the
N=1024 bench shape, to direct further optimization (the fused step
measures ~8.6 ms at B=16384 with bb=512/jg=2 — which phase owns it?).

python tools/profile_hi_phases.py [B]
"""
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import limbs as lb
from concrete_tpu.ops import pallas_step as ps
from concrete_tpu.ops.pallas_dot_recombine import (build_fused_rhs,
                                                   dot_recombine_hi)

P = pp.BENCH_PARAMS_4BIT_TPUOPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N = P.polynomial_size
KP1 = P.glwe_dimension + 1
L = P.pbs_level
rng = np.random.default_rng(0)
from concrete_tpu.params import choose_truncate_limbs
trunc = choose_truncate_limbs(P, 4, norm2=1)
keep = 8 - trunc
assert trunc * 8 >= 32
bsk_u64 = rng.integers(0, 1 << 63, (2, L, KP1, KP1, N), dtype=np.uint64)
bsk = kn.pack_bsk(bsk_u64, P, truncate_limbs=trunc)
w_vv = bsk.planes[0]
hi = jnp.asarray(rng.integers(0, 1 << 32, (B * KP1, N), dtype=np.int64)
                 .astype(np.uint32))
a_rows = jnp.asarray(
    np.repeat(rng.integers(0, 2 * N, (B,)), KP1).astype(np.int32))
STEPS = 4
print(f"B={B} n={P.n_small} trunc={trunc} keep={keep}", flush=True)


def bench(name, step_fn, carry, iters=3):
    @jax.jit
    def run(c):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, c, None, length=STEPS)
        return out

    out = run(carry)
    int(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = run(carry)
        int(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    dt = ((time.time() - t0) / iters - 0.030) / STEPS
    print(f"{name:40s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def step_rot(carry):
    (hi,) = carry
    d = ps.rotate_decompose_limbs_hi(hi, a_rows, base_log=P.pbs_base_log,
                                     levels=L, a_limbs=1)
    return (hi + d[0].astype(jnp.uint32),)


bench("rotate_decompose_limbs_hi", step_rot, (hi,))

lhs_const = jnp.asarray(
    rng.integers(-127, 128, (B, L * KP1 * N)).astype(np.int8))


def step_dot(bb, jg):
    def f(carry):
        (hi,) = carry
        rhs = build_fused_rhs(w_vv, 128, keep)
        hi2 = dot_recombine_hi(lhs_const, rhs, hi.reshape(B, KP1 * N),
                               keep=keep, limb_offset=trunc,
                               block_b=bb, j_group=jg)
        return (hi2.reshape(B * KP1, N),)
    return f


bench("dot_recombine_hi bb=512 jg=2", step_dot(512, 2), (hi,))
bench("dot_recombine_hi bb=1024 jg=1", step_dot(1024, 1), (hi,))
