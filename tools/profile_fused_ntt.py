"""Profile + validate the fused single-kernel CRT-NTT blind rotate on TPU.

python tools/profile_fused_ntt.py [B] [--params 6bit|4bit-tpuopt] [--rb R]
Runs a full PBS batch through pbs_batch with a FusedBSK, times it, and
checks decryption correctness (cheap stand-in for the host oracle at
N=4096).  Uses the shared bench keyset cache.
"""
import argparse
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp
from concrete_tpu.core import kernels as kn
from concrete_tpu.core import refimpl as ref
from concrete_tpu.ops import pallas_fused_ntt as fn

ap = argparse.ArgumentParser()
ap.add_argument("batch", type=int, nargs="?", default=1024)
ap.add_argument("--params", default="6bit",
                choices=["6bit", "4bit-tpuopt", "5bit-n2048"])
ap.add_argument("--pbits", type=int, default=None)
ap.add_argument("--rb", type=int, default=None, help="row block override")
ap.add_argument("--iters", type=int, default=3)
args = ap.parse_args()

#: our optimizer's 5-bit norm2=0 pick (tools/ref/v0_tpu_128.txt): the
#: N=2048 dispatch-calibration point (VERDICT r4 #6)
PARAMS_5BIT_N2048 = pp.CryptoParams.make(
    n_small=768, glwe_dimension=1, polynomial_size=2048,
    pbs_level=3, pbs_base_log=6, ks_level=8, ks_base_log=2)

P = {"6bit": pp.BENCH_PARAMS_6BIT,
     "4bit-tpuopt": pp.BENCH_PARAMS_4BIT_TPUOPT,
     "5bit-n2048": PARAMS_5BIT_N2048}[args.params]
p_bits = args.pbits or {"6bit": 6, "4bit-tpuopt": 4,
                        "5bit-n2048": 5}[args.params]
B = args.batch
print(f"device={jax.devices()[0]} B={B} params={args.params} "
      f"(n={P.n_small} N={P.polynomial_size} k={P.glwe_dimension} "
      f"l={P.pbs_level} bl={P.pbs_base_log})", flush=True)

sys.path.insert(0, ".")
from bench import _cached_keyset  # noqa: E402

rng = np.random.default_rng(2026)
t0 = time.time()
sk, server = _cached_keyset(P)
print(f"keyset: {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
primes, tb = fn.choose_fused_primes(P, message_bits=p_bits)
fbsk = fn.pack_bsk_fused(server.bsk, P, message_bits=p_bits)
ksk = kn.pack_ksk(server.ksk, P)
print(f"pack: {time.time() - t0:.1f}s primes={primes} trunc_bits={tb} "
      f"dl={fn.digit_limbs(P.pbs_base_log)}", flush=True)

lut = np.array([(3 * v + 1) % (1 << p_bits) for v in range(1 << p_bits)],
               dtype=np.uint64)
lut_poly = jnp.asarray(ref.encode_expand_lut(lut, P.polynomial_size, p_bits))
msgs = rng.integers(0, 1 << p_bits, B)
from concrete_tpu.core import keygen as kg  # noqa: E402

ct = jnp.asarray(kg.encrypt_lwe_batch(rng, sk.lwe_big,
                                      ref.encode(msgs, p_bits),
                                      P.lwe_std / 4))


def run(c):
    return kn.pbs_batch(c, ksk, fbsk, lut_poly, P, p_bits)


t0 = time.time()
out = run(ct)
int(out[0, -1])
print(f"compile+first: {time.time() - t0:.1f}s", flush=True)

times = []
for _ in range(args.iters):
    t0 = time.time()
    int(run(ct)[0, -1])
    times.append(time.time() - t0)
best = min(times)
print(f"times: {[f'{t*1e3:.0f}' for t in times]} ms -> "
      f"{B / best:.1f} PBS/s/chip "
      f"({best / P.n_small * 1e3:.3f} ms/step)", flush=True)

dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, np.asarray(out)), p_bits)
want = (3 * msgs + 1) % (1 << p_bits)
errs = int((dec != want).sum())
print(f"correctness: {B - errs}/{B}", flush=True)
