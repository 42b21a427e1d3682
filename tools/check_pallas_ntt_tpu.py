"""Validate the Pallas NTT stage kernels on the real TPU: fwd/inv
exactness vs the host oracle (catches Mosaic lowering divergence that
interpret mode cannot).  The per-stage external-product/blind-rotate
stages this tool once profiled were retired in round 4 (the fused
single-kernel path in ops/pallas_fused_ntt.py supersedes them; its
harnesses are tools/ablate_fused_step.py and tools/profile_fused_ntt.py).
"""
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp
from concrete_tpu.core import ntt as ntt_host
from concrete_tpu.core import ntt_tpu as nt
from concrete_tpu.core import kernels as kn
from concrete_tpu.ops import pallas_ntt as pn

P = pp.BENCH_PARAMS_6BIT
B = 256
N = P.polynomial_size
K = P.glwe_dimension
L = P.pbs_level
CIN = L * (K + 1)
primes = nt.choose_primes(P)
print(f"params: n={P.n_small} N={N} k={K} l={L} Cin={CIN} primes={primes}",
      flush=True)
rng = np.random.default_rng(0)

# ---- stage 1: exactness on hardware --------------------------------------
plan = pn.build_pallas_plan(N, primes[0])
digits = rng.integers(-(1 << 21), 1 << 21, (8, N)).astype(np.int32)
spec = pn.ntt_fwd_pallas(jnp.asarray(digits), plan, interpret=False)
nat = ntt_host.ntt_forward(digits.astype(np.int64) % primes[0], N, primes[0])
k1g, k2g = np.meshgrid(np.arange(plan.n1), np.arange(N // plan.n1),
                       indexing="ij")
perm = (k2g * plan.n1 + k1g).reshape(-1)
got = np.asarray(spec)
assert np.array_equal(got, nat[..., perm].astype(np.uint32)), "fwd mismatch"
back = np.asarray(pn.ntt_inv_pallas(spec, plan, interpret=False))
want = (digits.astype(np.int64) % primes[0]).astype(np.uint32)
assert np.array_equal(back, want), "inv roundtrip mismatch"
print("stage 1: fwd/inv bit-exact on TPU", flush=True)
print("done")
