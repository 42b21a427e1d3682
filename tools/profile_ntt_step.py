"""Profile the Pallas CRT-NTT external-product step on the real TPU.

Times each phase without the chain-harness overhead of
check_pallas_ntt_tpu.py: the external product alone, the Garner pack, and
a real blind-rotate scan step.  python tools/profile_ntt_step.py [B]
"""
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.ops import pallas_ntt as pn

P = pp.BENCH_PARAMS_6BIT
B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
CIN = L * (K + 1)
primes = nt.choose_primes(P)
print(f"B={B} n={P.n_small} N={N} k={K} l={L} Cin={CIN} "
      f"primes={len(primes)}", flush=True)
rng = np.random.default_rng(0)

bsk_u64 = rng.integers(0, 1 << 63, (4, L, K + 1, K + 1, N), dtype=np.uint64)
pbsk = pn.pack_bsk_pallas(bsk_u64, P, primes=primes)
spec_j = jnp.moveaxis(pbsk.spectra, 1, 0)[0]          # (primes, Cin, k+1, N)

STEPS = 8


def bench(name, fn, *args, iters=3):
    @jax.jit
    def run(*a):
        return fn(*a)

    out = run(*args)
    int(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = run(*args)
        int(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    dt = (time.time() - t0) / iters - 0.030
    print(f"{name:44s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


# digits for STEPS steps so the scan can't hoist anything
d_steps = jnp.asarray(rng.integers(
    -(1 << (P.pbs_base_log - 1)), 1 << (P.pbs_base_log - 1),
    (STEPS, B, CIN, N)).astype(np.int32))


def ext_scan(ds):
    def body(acc, d):
        out = pn.external_product_pallas(d, spec_j, pbsk.primes, P)
        return acc + out, None
    acc0 = jnp.zeros((B, K + 1, N), dtype=jnp.uint64)
    acc, _ = jax.lax.scan(body, acc0, ds)
    return acc


t = bench(f"external_product x{STEPS} (scan)", ext_scan, d_steps)
print(f"  -> {t / STEPS * 1e3:.3f} ms/step", flush=True)

# garner alone
res = [jnp.asarray(rng.integers(0, p, (B * (K + 1), N), dtype=np.int64)
                   .astype(np.uint32)) for p in primes]


def garner_scan(r):
    def body(acc, _):
        lo, hi = pn.garner_pallas(r, pbsk.primes)
        return acc + lo + hi, None
    acc, _ = jax.lax.scan(body, jnp.zeros_like(r[0]), None, length=STEPS)
    return acc


t = bench(f"garner x{STEPS} (scan)", garner_scan, res)
print(f"  -> {t / STEPS * 1e3:.3f} ms/step", flush=True)

# u64 pack + accumulate alone (the XLA tail of external_product_pallas)
lo = jnp.asarray(rng.integers(0, 1 << 32, (B * (K + 1), N),
                              dtype=np.int64).astype(np.uint32))


def pack_scan(lo):
    def body(acc, _):
        out = lo.astype(jnp.uint64) << jnp.uint64(32) | lo.astype(jnp.uint64)
        return acc + out.reshape(B, K + 1, N), None
    acc, _ = jax.lax.scan(body, jnp.zeros((B, K + 1, N), jnp.uint64), None,
                          length=STEPS)
    return acc


t = bench(f"u64 pack+acc x{STEPS} (scan)", pack_scan, lo)
print(f"  -> {t / STEPS * 1e3:.3f} ms/step", flush=True)

# real blind-rotate scan step cost: run a trimmed-n BSK (pack n_trim real
# rows — slicing the 4-row probe key leaves too few scan steps)
n_trim = 16
bsk_u64_t = rng.integers(0, 1 << 63, (n_trim, L, K + 1, K + 1, N),
                         dtype=np.uint64)
bsk_small = pn.pack_bsk_pallas(bsk_u64_t, P, primes=primes)
ct = jnp.asarray(rng.integers(0, 1 << 63, (B, n_trim + 1), dtype=np.uint64))
lut_poly = jnp.asarray(rng.integers(0, 1 << 63, N, dtype=np.uint64))

import dataclasses
P_trim = dataclasses.replace(P, n_small=n_trim)


def rotate_small(c):
    return pn.blind_rotate_pallas_ntt(c, bsk_small, lut_poly, P_trim)


t = bench(f"blind_rotate {n_trim} steps", rotate_small, ct)
per = t / n_trim * 1e3
print(f"  -> {per:.3f} ms/step -> full rotate {per * P.n_small / 1e3:.2f} s"
      f" -> {B / (per * P.n_small / 1e3):.0f} PBS/s at B={B}", flush=True)
