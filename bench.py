"""Benchmark: batched programmable-bootstrap throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 1e4 PBS/sec on a v5e-8 at N=1024 / 128-bit
=> 1250 PBS/sec per chip.  vs_baseline = measured_per_chip / 1250.

Usage: python bench.py [--batch 4096] [--iters 3] [--quick] [--check]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="small batch / tiny params smoke run")
    ap.add_argument("--check", action="store_true",
                    help="decrypt outputs and verify the LUT was applied")
    ap.add_argument("--params", choices=["4bit", "4bit-tpuopt", "6bit",
                                         "tiny"],
                    default="4bit-tpuopt")
    args = ap.parse_args()

    import concrete_tpu.jax_config  # noqa: F401
    import jax
    import jax.numpy as jnp
    from concrete_tpu.core import keygen as kg
    from concrete_tpu.core import kernels as K
    from concrete_tpu.core import refimpl as ref
    from concrete_tpu import params as pp

    params = {"4bit": pp.BENCH_PARAMS_4BIT,
              "4bit-tpuopt": pp.BENCH_PARAMS_4BIT_TPUOPT,
              "6bit": pp.BENCH_PARAMS_6BIT,
              "tiny": pp.TEST_PARAMS_TINY}[args.params]
    p_bits = {"4bit": 4, "4bit-tpuopt": 4, "6bit": 6, "tiny": 3}[args.params]
    batch = 64 if args.quick else args.batch

    dev = jax.devices()[0]
    print(f"# device: {dev}, params: {args.params} "
          f"(n={params.n_small}, k={params.glwe_dimension}, "
          f"N={params.polynomial_size}, l={params.pbs_level}), batch={batch}",
          file=sys.stderr)

    rng = np.random.default_rng(2026)
    t0 = time.time()
    sk, server = kg.keygen(rng, params)
    print(f"# keygen: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    ksk = K.pack_ksk(server.ksk, params)
    # dropping 2 low BSK limb planes adds ~2^-34 torus variance (see
    # params.variance_bsk_limb_truncation) - negligible vs the 2^-16 budget
    bsk = K.pack_bsk(server.bsk, params, truncate_limbs=2)
    lut = np.array([(3 * v + 1) % (1 << p_bits) for v in range(1 << p_bits)],
                   dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut, params.polynomial_size, p_bits))
    msgs = rng.integers(0, 1 << p_bits, batch)
    ct = jnp.asarray(kg.encrypt_lwe_batch(
        rng, sk.lwe_big, ref.encode(msgs, p_bits), params.lwe_std / 4))
    print(f"# pack+encrypt: {time.time() - t0:.1f}s", file=sys.stderr)

    run = jax.jit(lambda c: K.pbs_batch(c, ksk, bsk, lut_poly, params, p_bits))
    t0 = time.time()
    out = run(ct)
    out.block_until_ready()
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        run(ct).block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    pbs_per_sec = batch / best
    print(f"# times: {[f'{t:.3f}' for t in times]}, "
          f"best {best * 1e3:.1f} ms -> {pbs_per_sec:.1f} PBS/s/chip",
          file=sys.stderr)

    if args.check:
        dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, np.asarray(out)), p_bits)
        want = (3 * msgs + 1) % (1 << p_bits)
        errs = int((dec != want).sum())
        print(f"# correctness: {batch - errs}/{batch} correct", file=sys.stderr)
        assert errs <= max(2, batch * 1e-3), f"too many errors: {errs}"

    print(json.dumps({
        "metric": "pbs_throughput_per_chip",
        "value": round(pbs_per_sec, 1),
        "unit": "PBS/s",
        "vs_baseline": round(pbs_per_sec / 1250.0, 3),
    }))


if __name__ == "__main__":
    main()
