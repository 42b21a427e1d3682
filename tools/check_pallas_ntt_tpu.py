"""Validate + profile the fused Pallas NTT kernels on the real TPU.

Stage 1: fwd/inv exactness vs the host oracle (catches Mosaic lowering
divergence that interpret mode can't).
Stage 2: per-component timings (chained fori_loop, one fetch).
Stage 3: one full external-product step vs the XLA NTT path.
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
perm = pn._plan_perm(N, plan.n1)
got = np.asarray(spec)
assert np.array_equal(got, nat[..., perm].astype(np.uint32)), "fwd mismatch"
back = np.asarray(pn.ntt_inv_pallas(spec, plan, interpret=False))
want = (digits.astype(np.int64) % primes[0]).astype(np.uint32)
assert np.array_equal(back, want), "inv roundtrip mismatch"
print("stage 1: fwd/inv bit-exact on TPU", flush=True)

# ---- stage 2: timings ------------------------------------------------------
CHAIN = 16


def bench(name, fn, x, iters=5):
    import functools

    @jax.jit
    def run(v):
        return jax.lax.fori_loop(0, CHAIN, lambda i, a: fn(a), v)

    leaf = jax.tree_util.tree_leaves(run(x))[0]
    int(np.asarray(leaf.reshape(-1)[0]))
    t0 = time.time()
    for _ in range(iters):
        out = run(x)
        int(np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]))
    dt = (time.time() - t0) / iters
    per = (dt - 0.030) / CHAIN * 1e3
    print(f"{name:44s} {per:8.3f} ms/op", flush=True)
    return per


bsk_u64 = rng.integers(0, 1 << 63, (4, L, K + 1, K + 1, N), dtype=np.uint64)
pbsk = pn.pack_bsk_pallas(bsk_u64, P, primes=primes)
spec_j = jnp.moveaxis(pbsk.spectra, 1, 0)[0]       # (primes, Cin, k+1, N)

res = jnp.asarray(rng.integers(0, primes[0], (B * CIN, N), dtype=np.int64)
                  .astype(np.uint32))
d32 = jnp.asarray(rng.integers(-(1 << 21), 1 << 21,
                               (B, CIN, N)).astype(np.int32))

t_fwd = bench("pallas ntt_fwd (B*Cin, N)",
              lambda x: pn.ntt_fwd_pallas(
                  jax.lax.bitcast_convert_type(x, jnp.int32), plan,
                  interpret=False), res)
t_inv = bench("pallas ntt_inv (B*Cin, N)",
              lambda x: pn.ntt_inv_pallas(x, plan, interpret=False), res)
t_pw = bench("pallas pointwise (B, Cin, N)",
             lambda x: pn.pointwise_pallas(
                 x.reshape(B, CIN, N), spec_j[0], plan,
                 interpret=False).reshape(-1, N), res)


def ext(d):
    return pn.external_product_pallas(d, spec_j, pbsk.primes, P,
                                      interpret=False).astype(jnp.uint64)


def ext_chain(d):
    # keep dtype/shape stable across the chain: re-derive digits
    out = ext(d)                                   # (B, k+1, N) u64
    nd = (out % jnp.uint64(1 << 20)).astype(jnp.int32)
    nd = jnp.concatenate([nd] * L, axis=1) if L > 1 else nd
    return nd.reshape(B, CIN, N)


t_ext = bench("pallas external_product full (1 step)", ext_chain, d32,
              iters=3)
n_steps = P.n_small
print(f"\nfull-blind-rotate estimate: {t_ext * n_steps / 1e3:.2f} s "
      f"({t_ext:.2f} ms x {n_steps} steps) at B={B}"
      f" -> {B / (t_ext * n_steps / 1e3):.0f} PBS/s", flush=True)

# ---- stage 3: exactness of one step vs the XLA NTT path -------------------
if "--quick" not in sys.argv:
    nbsk = nt.pack_bsk_ntt(bsk_u64, P, primes=primes)
    d_small = np.asarray(d32[:4])
    got = np.asarray(pn.external_product_pallas(
        jnp.asarray(d_small), spec_j, pbsk.primes, P, interpret=False))
    want = np.asarray(nt.external_product_ntt(
        jnp.asarray(d_small), jnp.moveaxis(nbsk.spectra, 1, 0)[0],
        nbsk.primes, P))
    assert np.array_equal(got, want), "external product mismatch vs XLA NTT"
    print("stage 3: external product bit-exact vs XLA NTT path", flush=True)

# ---- stage 4: full 6-bit PBS correctness + throughput ----------------------
if "--full" in sys.argv:
    from concrete_tpu.core import keygen as kg
    from concrete_tpu.core import refimpl as ref
    from concrete_tpu.ops import pallas_ntt as pnx

    rng4 = np.random.default_rng(7)
    t0 = time.time()
    sk, server = kg.keygen(rng4, P)
    print(f"stage 4: keygen {time.time() - t0:.1f}s", flush=True)
    bits = 6
    lut = np.array([(3 * v + 1) % 64 for v in range(64)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(lut, N, bits))
    batch = 2048
    msgs = rng4.integers(0, 64, batch)
    ct = kg.encrypt_lwe_batch(rng4, sk.lwe_big, ref.encode(msgs, bits),
                              P.lwe_std / 1024)
    ksk = kn.pack_ksk(server.ksk, P)
    pbsk2 = pnx.pack_bsk_pallas(server.bsk, P)
    t0 = time.time()
    out = kn.pbs_batch(jnp.asarray(ct), ksk, pbsk2, lut_poly, P, bits)
    int(np.asarray(out[0, 0]))
    print(f"stage 4: compile+first run {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = kn.pbs_batch(jnp.asarray(ct), ksk, pbsk2, lut_poly, P, bits)
    int(np.asarray(out[0, 0]))
    dt = time.time() - t0
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, np.asarray(out)), bits)
    ok = int((dec == (3 * msgs + 1) % 64).sum())
    print(f"stage 4: {ok}/{batch} correct, {batch / dt:.0f} PBS/s/chip "
          f"at N={N} (banded baseline: 82)", flush=True)
