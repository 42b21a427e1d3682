"""Ablation profile of the N=1024 banded blind-rotate step on the TPU.

Times each phase of core/kernels._blind_rotate_pallas's scan step in
isolation (chained in a scan so XLA can't fold work away), to locate where
the 17.7 ms/step (at B=16384 -> 1301 PBS/s) actually goes.

python tools/profile_banded_step.py [B]
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

P = pp.BENCH_PARAMS_4BIT_TPUOPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
KP1 = K + 1
CIN = L * KP1
rng = np.random.default_rng(0)
print(f"B={B} n={P.n_small} N={N} k={K} l={L} base={P.pbs_base_log}",
      flush=True)

from concrete_tpu.params import choose_truncate_limbs
trunc = choose_truncate_limbs(P, 4, norm2=1)
keep = 8 - trunc
a_limbs_n = lb.num_digit_limbs(P.pbs_base_log)
block = min(128, N)
print(f"truncate={trunc} keep={keep} A={a_limbs_n}", flush=True)

bsk_u64 = rng.integers(0, 1 << 63, (2, L, KP1, KP1, N), dtype=np.uint64)
bsk = kn.pack_bsk(bsk_u64, P, truncate_limbs=trunc)
w_vv = bsk.planes[0]                      # (Cin, k+1, S, 2N-1)

lo = jnp.asarray(rng.integers(0, 1 << 32, (B * KP1, N), dtype=np.int64)
                 .astype(np.uint32))
hi = jnp.asarray(rng.integers(0, 1 << 32, (B * KP1, N), dtype=np.int64)
                 .astype(np.uint32))
a_j = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int64)
                  .astype(np.uint64))
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
    print(f"{name:44s} {dt * 1e3:8.3f} ms/step", flush=True)
    return dt


def mk_lhs(d_planes):
    lhs_list = []
    for a in range(a_limbs_n):
        if L == 1:
            lhs = d_planes[a].reshape(B, KP1 * N)
        else:
            lhs = jnp.concatenate(
                [d_planes[lev * a_limbs_n + a].reshape(B, KP1, N)
                 for lev in range(L)], axis=1).reshape(B, L * KP1 * N)
        lhs_list.append(lhs)
    return lhs_list


a_rows = jnp.repeat(a_j, KP1, total_repeat_length=B * KP1)
a_rows = a_rows.astype(jnp.int32)

# (a) rotate+decompose+limb-split only
def step_rot(carry):
    lo, hi = carry
    d = ps.rotate_decompose_limbs(lo, hi, a_rows, base_log=P.pbs_base_log,
                                  levels=L, a_limbs=a_limbs_n)
    # fold the planes back into the carry so nothing is dead
    return (lo + d[0][:B * KP1].astype(jnp.uint32)[:, :N], hi)


t_rot = bench("rotate_decompose_limbs", step_rot, (lo, hi))

# (b) band-stack build (the M sliding-window stack) alone
def step_mstack(carry):
    (x,) = carry
    m = jnp.stack([
        jax.lax.slice_in_dim(w_vv, block - 1 - r,
                             block - 1 - r + (2 * (N // block) - 1) * block,
                             axis=-1)
        for r in range(block)], axis=1)
    return (x + m[0, 0, 0, 0, :N].astype(jnp.uint32) + x * 0,)


t_m = bench("band-stack M build", step_mstack, (lo[:, :N],))

# (c) matmuls (lhs from fixed planes, full banded matmul incl. M build)
d_planes_const = [jnp.asarray(
    rng.integers(-127, 128, (B * KP1, N)).astype(np.int8))
    for _ in range(L * a_limbs_n)]


def step_mm(carry):
    lo, hi = carry
    lhs_list = mk_lhs(d_planes_const)
    planes = kn.negacyclic_banded_matmul_planes(lhs_list, w_vv, block)
    planes = planes[:, :, :keep, :].reshape(B * KP1, keep, N)
    return (lo + planes[:, 0, :].astype(jnp.uint32), hi)


t_mm = bench("banded matmul (M build + dots)", step_mm, (lo, hi))

# (c2) fused single-dot matmul (rhs build + one dot, truncated planes
# never computed)
def step_mm_fused(carry):
    lo, hi = carry
    lhs_list = mk_lhs(d_planes_const)
    planes = kn.negacyclic_banded_matmul_fused(lhs_list, w_vv, block,
                                               out_planes=keep)
    planes = planes.reshape(B * KP1, keep, N)
    return (lo + planes[:, 0, :].astype(jnp.uint32), hi)


t_mmf = bench("fused single-dot matmul", step_mm_fused, (lo, hi))

# (d) recombine+accumulate alone (planes as carry, not a baked constant —
# a 512 MB literal overflows the remote-compile request body)
planes_const = jnp.asarray(rng.integers(
    -(1 << 20), 1 << 20, (B * KP1, keep, N)).astype(np.int32))


def step_rec(carry):
    lo, hi, planes = carry
    lo2, hi2 = ps.recombine_accumulate(planes, lo, hi,
                                       limb_offset=trunc)
    return (lo2, hi2, planes)


t_rec = bench("recombine_accumulate", step_rec, (lo, hi, planes_const))

# (e) full step
def step_full(carry):
    lo, hi = carry
    d_planes = ps.rotate_decompose_limbs(lo, hi, a_rows,
                                         base_log=P.pbs_base_log,
                                         levels=L, a_limbs=a_limbs_n)
    lhs_list = mk_lhs(d_planes)
    planes = kn.negacyclic_banded_matmul_planes(lhs_list, w_vv, block)
    planes = planes[:, :, :keep, :].reshape(B * KP1, keep, N)
    return ps.recombine_accumulate(planes, lo, hi, limb_offset=trunc)


t_full = bench("FULL step", step_full, (lo, hi))


# (f) full step with the fused single-dot matmul
def step_full_fused(carry):
    lo, hi = carry
    d_planes = ps.rotate_decompose_limbs(lo, hi, a_rows,
                                         base_log=P.pbs_base_log,
                                         levels=L, a_limbs=a_limbs_n)
    lhs_list = mk_lhs(d_planes)
    planes = kn.negacyclic_banded_matmul_fused(lhs_list, w_vv, block,
                                               out_planes=keep)
    planes = planes.reshape(B * KP1, keep, N)
    return ps.recombine_accumulate(planes, lo, hi, limb_offset=trunc)


t_fullf = bench("FULL step (fuseddot)", step_full_fused, (lo, hi))
print(f"\nsum of parts (a+c+d): {(t_rot + t_mm + t_rec) * 1e3:.3f} ms; "
      f"full {t_full * 1e3:.3f} ms; fused full {t_fullf * 1e3:.3f} ms; "
      f"-> {B / (t_full * P.n_small):.0f} PBS/s (planes), "
      f"{B / (t_fullf * P.n_small):.0f} PBS/s (fuseddot) at B={B}",
      flush=True)


# (g) dot+recombine fused Pallas kernel (ops/pallas_dot_recombine.py):
# the int32 planes never leave VMEM
if a_limbs_n == 1 and N % 128 == 0:
    from concrete_tpu.ops.pallas_dot_recombine import (build_fused_rhs,
                                                       dot_recombine)

    def step_dr_only(carry):
        lo, hi = carry
        lhs_list = mk_lhs(d_planes_const)
        rhs = build_fused_rhs(w_vv, 128, keep)
        lo2, hi2 = dot_recombine(
            lhs_list[0], rhs, lo.reshape(B, KP1 * N),
            hi.reshape(B, KP1 * N), keep=keep, limb_offset=trunc)
        return (lo2.reshape(B * KP1, N), hi2.reshape(B * KP1, N))

    t_dr = bench("dot+recombine fused (const lhs)", step_dr_only, (lo, hi))

    def step_full_dr(carry):
        lo, hi = carry
        d_planes = ps.rotate_decompose_limbs(lo, hi, a_rows,
                                             base_log=P.pbs_base_log,
                                             levels=L, a_limbs=a_limbs_n)
        lhs_list = mk_lhs(d_planes)
        rhs = build_fused_rhs(w_vv, 128, keep)
        lo2, hi2 = dot_recombine(
            lhs_list[0], rhs, lo.reshape(B, KP1 * N),
            hi.reshape(B, KP1 * N), keep=keep, limb_offset=trunc)
        return (lo2.reshape(B * KP1, N), hi2.reshape(B * KP1, N))

    t_fdr = bench("FULL step (fusedrecombine)", step_full_dr, (lo, hi))
    print(f"fusedrecombine: {B / (t_fdr * P.n_small):.0f} PBS/s at B={B}",
          flush=True)
