"""Micro-profile the CRT-NTT blind-rotate components on the real TPU.

Per-op times are measured by chaining K=32 applications inside one jitted
fori_loop (one dispatch + one 8-byte fetch), which removes the ~30 ms
tunnel RTT floor that swamps per-call timings on axon.
"""
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.core import kernels as kn

P = pp.BENCH_PARAMS_6BIT
B = 256
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
CIN = L * (K + 1)
primes = nt.choose_primes(P)
print(f"params: n={P.n_small} N={N} k={K} l={L} Cin={CIN} primes={len(primes)}")

rng = np.random.default_rng(0)
plan = nt.build_plan(N, primes[0])
CHAIN = 32


def chained(fn):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, CHAIN, lambda i, v: fn(v), x)
    return run


def fetch1(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return int(leaf.reshape(-1)[0])


def bench(name, fn, x, iters=5):
    run = chained(fn)
    fetch1(run(x))   # warmup/compile
    t0 = time.time()
    for _ in range(iters):
        fetch1(run(x))
    dt = (time.time() - t0) / iters
    per_op = (dt - 0.030) / CHAIN * 1e3   # subtract ~RTT, per application
    print(f"{name:38s} {per_op:8.3f} ms/op")
    return per_op


res = jnp.asarray(rng.integers(0, primes[0], (B, CIN, N), dtype=np.int64)
                  .astype(np.uint32))
res64 = res.astype(jnp.uint64)
acc = jnp.asarray(rng.integers(0, 1 << 63, (B, K + 1, N), dtype=np.uint64))
bsk_u64 = rng.integers(0, 1 << 63, (4, L, K + 1, K + 1, N), dtype=np.uint64)
bsk = nt.pack_bsk_ntt(bsk_u64, P, primes=primes)
spec_j = jnp.moveaxis(bsk.spectra, 1, 0)[0]  # (primes, Cin, k+1, N)

t_fwd = bench("ntt_fwd (B,Cin,N)", lambda x: nt.ntt_fwd(x, plan), res)
t_inv = bench("ntt_inv (B,Cin,N)", lambda x: nt.ntt_inv(x, plan), res)
t_mm = bench("matmul_mod only (same shape)",
             lambda x: nt._matmul_mod(
                 x.reshape(B, CIN, plan.n1, plan.n2), plan.dft2, plan)
             .reshape(B, CIN, N), res)
t_mul = bench("mul_mod32 elementwise (B,Cin,N)",
              lambda x: nt._mul_mod32(x, x, plan), res)
t_fold = bench("fold from 2^62 (B,Cin,N)",
               lambda x: nt._fold(x, plan, 1 << 62), res64)
t_tw = bench("swapaxes+mul_mod32 (twiddle step)",
             lambda x: jnp.swapaxes(nt._mul_mod32(
                 jnp.swapaxes(x.reshape(B, CIN, plan.n1, plan.n2), -1, -2),
                 plan.tw_f, plan), -1, -2).reshape(B, CIN, N), res)
t_roll = bench("monomial rolls (B,k+1,N)",
               lambda a: kn.monomial_mul_rolls(a, a[:, 0, 0] % (2 * N)), acc)
t_dec = bench("decompose+reshape (B,k+1,N)",
              lambda a: jnp.transpose(
                  kn.decompose(a, P.pbs_base_log, L), (0, 3, 1, 2))
              .reshape(B, L * (K + 1), N).astype(jnp.uint64), acc)


def ext_step(a):
    digits = (a % jnp.uint64(1 << P.pbs_base_log)).astype(jnp.int32)
    d = digits.reshape(B, K + 1, N)
    d = jnp.concatenate([d] * L, axis=1) if L > 1 else d
    return nt.external_product_ntt(d.astype(jnp.int32), spec_j,
                                   bsk.primes, P).astype(jnp.uint64)


t_ext = bench("external_product full (1 step)", ext_step, acc, iters=3)

n_steps = P.n_small
print(f"\nfull-blind-rotate estimate: {t_ext * n_steps / 1e3:.2f} s "
      f"({t_ext:.2f} ms x {n_steps} steps) at B={B}")
print(f"transforms account: 4 primes x (fwd {t_fwd:.2f} + inv {t_inv:.2f}) "
      f"= {4 * (t_fwd + t_inv):.2f} ms")
