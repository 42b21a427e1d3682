"""Tile-size sweep of the fused dot+recombine blind-rotate step on TPU.

The first (block_b=1024, block_k=1024) config ran the Mosaic dot at ~107
Tmac/s vs the 153 the same shape reaches under XLA (probe_dot_rate.py);
this sweeps the grid tiles to find the MXU-efficient point.

python tools/sweep_dot_recombine.py
"""
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
                                                   dot_recombine)

P = pp.BENCH_PARAMS_4BIT_TPUOPT
B = 16384
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
KP1 = K + 1
rng = np.random.default_rng(0)
from concrete_tpu.params import choose_truncate_limbs
trunc = choose_truncate_limbs(P, 4, norm2=1)
keep = 8 - trunc
a_limbs_n = lb.num_digit_limbs(P.pbs_base_log)
assert a_limbs_n == 1

bsk_u64 = rng.integers(0, 1 << 63, (2, L, KP1, KP1, N), dtype=np.uint64)
bsk = kn.pack_bsk(bsk_u64, P, truncate_limbs=trunc)
w_vv = bsk.planes[0]
lo = jnp.asarray(rng.integers(0, 1 << 32, (B * KP1, N), dtype=np.int64)
                 .astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 1 << 32, (B * KP1, N), dtype=np.int64)
                 .astype(np.uint32))
a_j = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64)
                  .astype(np.uint64))
a_rows = jnp.repeat(a_j, KP1, total_repeat_length=B * KP1).astype(jnp.int32)
STEPS = 4


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
    print(f"{name:44s} {dt * 1e3:8.3f} ms/step "
          f"-> {B / (dt * P.n_small):5.0f} PBS/s", flush=True)
    return dt


def full_step(block_b, block_k, jo_outer=True, parallel_dims=False,
              j_group=1):
    def step(carry):
        lo, hi = carry
        d_planes = ps.rotate_decompose_limbs(lo, hi, a_rows,
                                             base_log=P.pbs_base_log,
                                             levels=L, a_limbs=1)
        lhs = jnp.concatenate(
            [d_planes[lev].reshape(B, KP1, N) for lev in range(L)],
            axis=1).reshape(B, L * KP1 * N)
        rhs = build_fused_rhs(w_vv, 128, keep)
        lo2, hi2 = dot_recombine(
            lhs, rhs, lo.reshape(B, KP1 * N), hi.reshape(B, KP1 * N),
            keep=keep, limb_offset=trunc, block_b=block_b,
            block_k=block_k, jo_outer=jo_outer,
            parallel_dims=parallel_dims, j_group=j_group)
        return (lo2.reshape(B * KP1, N), hi2.reshape(B * KP1, N))
    return step


def full_step_hi(block_b, block_k, j_group=1, parallel_dims=False,
                 segmented=True):
    """Hi-only accumulator step (kernels._blind_rotate_pallas_hi phases)."""
    from concrete_tpu.ops.pallas_dot_recombine import dot_recombine_hi

    def step(carry):
        (hi,) = carry
        d_planes = ps.rotate_decompose_limbs_hi(
            hi, a_rows, base_log=P.pbs_base_log, levels=L, a_limbs=1)
        if segmented:
            lhs = [d_planes[lev].reshape(B, KP1 * N) for lev in range(L)]
        else:
            lhs = jnp.concatenate(
                [d_planes[lev].reshape(B, KP1, N) for lev in range(L)],
                axis=1).reshape(B, L * KP1 * N)
        rhs = build_fused_rhs(w_vv, 128, keep)
        hi2 = dot_recombine_hi(
            lhs, rhs, hi.reshape(B, KP1 * N),
            keep=keep, limb_offset=trunc, block_b=block_b,
            block_k=block_k, j_group=j_group, parallel_dims=parallel_dims)
        return (hi2.reshape(B * KP1, N),)
    return step


import os
# spec = bb:bk:jo_outer:parallel[:j_group]
CONFIGS = os.environ.get(
    "CONCRETE_TPU_SWEEP",
    "256:8192:1:0:1,256:8192:1:0:2,256:8192:1:0:4,512:8192:1:0:2,"
    "256:8192:1:0:8,512:8192:1:0:4")
for spec in CONFIGS.split(","):
    hi_only = spec.startswith("hi:")
    parts = [int(v) for v in spec.split(":")[1 if hi_only else 0:]]
    bb, bk, joo, par = parts[:4]
    jg = parts[4] if len(parts) > 4 else 1
    try:
        if hi_only:
            assert trunc * 8 >= 32, trunc
            bench(f"fusedrecombine-HI bb={bb} bk={bk} jg={jg} par={par}",
                  full_step_hi(bb, bk, jg, bool(par)), (hi,))
        else:
            bench(f"fusedrecombine bb={bb} bk={bk} jo={joo} par={par} "
                  f"jg={jg}",
                  full_step(bb, bk, bool(joo), bool(par), jg), (lo, hi))
    except Exception as e:  # vmem OOM etc: report and keep sweeping
        print(f"fusedrecombine {spec}: "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)
