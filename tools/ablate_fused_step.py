"""Per-phase cost breakdown of the fused CRT-NTT step kernel on hardware.

Runs the fused blind rotate with a SHORT synthetic scan (default 64 steps,
random spectra — results are numerically meaningless) under each ablation
in turn and reports ms/step.  python tools/ablate_fused_step.py [B] [steps]
optionally CONCRETE_TPU_FUSED_ABLATE set externally for a single variant.
"""
import functools
import os
import sys
import time

import numpy as np

import concrete_tpu.jax_config  # noqa: F401
import jax
import jax.numpy as jnp

from concrete_tpu import params as pp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
RB = int(os.environ.get("CONCRETE_TPU_FUSED_RB", "0")) or None
P = pp.BENCH_PARAMS_6BIT
VARIANTS = os.environ.get(
    "CONCRETE_TPU_FUSED_VARIANTS",
    ",fwd,inv,pointwise,garner,rotate,twiddle,fwd:inv").split(",")

print(f"device={jax.devices()[0]} B={B} steps={STEPS} rb={RB}", flush=True)

rng = np.random.default_rng(0)
N = P.polynomial_size
kp1 = P.glwe_dimension + 1
cin = P.pbs_level * kp1


def run_variant(ablate: str):
    # the ablation set is read at module import (frozenset); this tool is
    # invoked once per variant with CONCRETE_TPU_FUSED_ABLATE preset
    assert os.environ.get("CONCRETE_TPU_FUSED_ABLATE", "") \
        == ablate.replace(":", ",")
    import concrete_tpu.ops.pallas_fused_ntt as fn
    primes, tb = fn.choose_fused_primes(P, message_bits=6)
    n1 = N // fn.N2
    # synthetic spectra/ct: timing only
    sv = jnp.asarray(rng.integers(
        0, primes[0], (STEPS, len(primes) * cin * kp1, N), dtype=np.int64)
        .astype(np.uint32))
    ss = jnp.asarray(rng.integers(
        0, 1 << 32, (STEPS, len(primes) * cin * kp1, N), dtype=np.int64)
        .astype(np.uint32))
    fbsk = fn.FusedBSK(spec_val=sv, spec_sh=ss, primes=primes,
                       trunc_bits=tb, base_log=P.pbs_base_log,
                       levels=P.pbs_level)
    ct = jnp.asarray(rng.integers(0, 1 << 63, (B, STEPS + 1),
                                  dtype=np.uint64))
    lut = jnp.asarray(rng.integers(0, 1 << 63, (N,), dtype=np.uint64))
    params = pp.CryptoParams(
        n_small=STEPS, glwe_dimension=P.glwe_dimension,
        polynomial_size=N, pbs_level=P.pbs_level,
        pbs_base_log=P.pbs_base_log, ks_level=P.ks_level,
        ks_base_log=P.ks_base_log, lwe_std=P.lwe_std,
        glwe_std=P.glwe_std, security_level=0)

    # keys/lut must be runtime ARGS, not closure constants: the remote
    # compile server chokes on multi-MB constant payloads (bench.py note)
    @functools.partial(jax.jit, static_argnames=("rb",))
    def run(c, keys, lp, rb=None):
        return fn.blind_rotate_fused(c, keys, lp, params, row_block=rb)

    t0 = time.time()
    out = run(ct, fbsk, lut, rb=RB)
    int(out[0, 0, 0])
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        int(run(ct, fbsk, lut, rb=RB)[0, 0, 0])
        times.append(time.time() - t0)
    best = min(times)
    name = ablate if ablate else "FULL"
    print(f"{name:16s} {best / STEPS * 1e3:8.3f} ms/step  "
          f"(compile {compile_s:.0f}s, run {best * 1e3:.0f} ms)", flush=True)
    return best / STEPS


run_variant(os.environ.get("CONCRETE_TPU_FUSED_ABLATE", ""))
