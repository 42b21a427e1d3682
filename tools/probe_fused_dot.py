"""Isolate the N=1024 fused-banded-step costs on TPU.

Stages: pure int8 dot with a prematerialized rhs (the MXU floor), the
slice-stack rhs build alone, a take-based Toeplitz rhs build alone, and
full fused steps using each build.  python tools/probe_fused_dot.py [B]
"""
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from concrete_tpu import params as pp
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import limbs as lb

P = pp.BENCH_PARAMS_4BIT_TPUOPT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
KP1 = K + 1
CIN = L * KP1
rng = np.random.default_rng(0)
from concrete_tpu.params import choose_truncate_limbs
trunc = choose_truncate_limbs(P, 4, norm2=1)
keep = 8 - trunc
A = lb.num_digit_limbs(P.pbs_base_log)
block = 128
print(f"B={B} n={P.n_small} N={N} k={K} l={L} A={A} keep={keep} "
      f"Cin={CIN}", flush=True)
print(f"dot: ({B}x{A*CIN*N}) @ ({A*CIN*N}x{KP1*keep*N}) int8; "
      f"{B*A*CIN*N*KP1*keep*N/1e12:.2f} Tmac -> "
      f"{B*A*CIN*N*KP1*keep*N/400e12*1e3:.2f} ms at 400 Top/s", flush=True)

bsk_u64 = rng.integers(0, 1 << 63, (2, L, KP1, KP1, N), dtype=np.uint64)
bsk = kn.pack_bsk(bsk_u64, P, truncate_limbs=trunc)
w_vv = bsk.planes[0]                      # (Cin, k+1, S=keep, 2N-1)

lhs_const = jnp.asarray(rng.integers(-127, 128, (B, A * CIN * N),
                                     dtype=np.int8))
rhs_const = jnp.asarray(rng.integers(-127, 128, (A * CIN * N, KP1 * keep * N),
                                     dtype=np.int8))
lo = jnp.asarray(rng.integers(0, 1 << 32, (B, N), dtype=np.int64)
                 .astype(np.uint32))
STEPS = 4


def bench(name, step_fn, carry, iters=3):
    @jax.jit
    def run(c):
        def body(c, _):
            return step_fn(c), None
        out, _ = lax.scan(body, c, None, length=STEPS)
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


def _carry_dep_lhs(lo, lhs):
    # tie the lhs to the carry so XLA cannot hoist the dot out of the scan
    col = (lo[:, :1] & 1).astype(jnp.int8)
    return lax.dynamic_update_slice(lhs, col, (0, 0))


def _carry_dep_vv(lo, vv):
    return vv + (lo[0, 0] & 1).astype(jnp.int8)


# (a) pure dot, rhs premade
def step_dot(carry):
    (lo,) = carry
    lhs = _carry_dep_lhs(lo, lhs_const)
    out = jnp.matmul(lhs, rhs_const, preferred_element_type=jnp.int32)
    return (lo + out[:, :N].astype(jnp.uint32),)


bench("pure int8 dot (rhs premade)", step_dot, (lo,))


def build_rhs_slices():
    return kn.negacyclic_banded_matmul_fused.__wrapped__(
        None, w_vv, block) if False else None


# (b) slice-stack rhs build alone (the negacyclic_banded_matmul_fused rhs)
def rhs_slices(vv):
    cin, cout, s_limbs, two_n_m1 = vv.shape
    n = N
    nb = n // block
    width = (2 * nb - 1) * block
    m = jnp.stack([
        lax.slice_in_dim(vv, block - 1 - r, block - 1 - r + width, axis=-1)
        for r in range(block)], axis=1)
    rows = []
    for i_blk in range(nb):
        band = jnp.stack([
            lax.slice_in_dim(m, (j_blk - i_blk + nb - 1) * block,
                             (j_blk - i_blk + nb - 1) * block + block,
                             axis=-1)
            for j_blk in range(nb)], axis=-2)
        rows.append(band)
    rhs = jnp.stack(rows, axis=1)
    return rhs.reshape(cin * n, cout, s_limbs, n)[:, :, :keep, :].reshape(
        cin * n, cout * keep * n)


def step_build_slices(carry):
    (lo,) = carry
    r = rhs_slices(_carry_dep_vv(lo, w_vv))
    return (lo + r[0:1, :N].astype(jnp.uint32),)


bench("rhs build: slice-stack", step_build_slices, (lo,))

# (c) take-based Toeplitz rhs build: rhs[(cin,i),(cout,s,j)] = vv[...,N-1+j-i]
idx = (N - 1 + jnp.arange(N)[None, :] - jnp.arange(N)[:, None])  # (i, j)


def rhs_take(vv):
    cin, cout, s_limbs, _ = vv.shape
    g = jnp.take(vv[:, :, :keep, :], idx.reshape(-1), axis=-1)
    g = g.reshape(cin, cout, keep, N, N)          # (cin,cout,s,i,j)
    return jnp.transpose(g, (0, 3, 1, 2, 4)).reshape(cin * N,
                                                     cout * keep * N)


def step_build_take(carry):
    (lo,) = carry
    r = rhs_take(_carry_dep_vv(lo, w_vv))
    return (lo + r[0:1, :N].astype(jnp.uint32),)


bench("rhs build: toeplitz take", step_build_take, (lo,))


# (d) full: take-build + dot
def step_take_dot(carry):
    (lo,) = carry
    r = rhs_take(_carry_dep_vv(lo, w_vv))
    lhs = _carry_dep_lhs(lo, lhs_const[:, :CIN * N])
    out = jnp.matmul(lhs, r, preferred_element_type=jnp.int32)
    return (lo + out[:, :N].astype(jnp.uint32),)


bench("take-build + dot", step_take_dot, (lo,))


# (e) slice-build + dot (the shipped fused formulation, carry-dependent)
def step_slices_dot(carry):
    (lo,) = carry
    r = rhs_slices(_carry_dep_vv(lo, w_vv))
    lhs = _carry_dep_lhs(lo, lhs_const[:, :CIN * N])
    out = jnp.matmul(lhs, r, preferred_element_type=jnp.int32)
    return (lo + out[:, :N].astype(jnp.uint32),)


bench("slice-build + dot", step_slices_dot, (lo,))
