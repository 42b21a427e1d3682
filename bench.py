"""Benchmark: batched programmable-bootstrap throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 1e4 PBS/sec on a v5e-8 at N=1024 / 128-bit
=> 1250 PBS/sec per chip.  vs_baseline = measured_per_chip / 1250.

Usage: python bench.py [--batch 4096] [--iters 3] [--quick] [--check]
       python bench.py --config quickstart|radix16|mlp   (BASELINE configs)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

#: wall-clock budget for the whole bench.  The driver killed rounds 3 AND 4
#: at rc=124 with the old 840 s value, so the real driver timeout is below
#: that; 540 leaves margin.  Tail rows are skipped when their *measured*
#: cost (persisted from previous runs, see _row_costs) no longer fits, and
#: the headline row is re-emitted after every tail row so the final JSON
#: line is the headline even if the process is killed mid-row.
BUDGET_S = float(os.environ.get("CONCRETE_TPU_BENCH_BUDGET_S", "540"))
_T0 = time.time()

#: the headline result; re-emitted after every tail row and on SIGTERM so
#: the driver's machine-readable summary (= last complete JSON line) can
#: never show a tail metric (rounds 3+4 regression)
_HEADLINE: dict = {}

_CACHE_DIR = os.path.expanduser("~/.cache/concrete_tpu_bench")


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T0)


def _emit_headline() -> None:
    if _HEADLINE:
        print(json.dumps(_HEADLINE), flush=True)


def _on_sigterm(signum, frame):  # noqa: ARG001
    print("# SIGTERM: flushing headline", file=sys.stderr)
    _emit_headline()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _row_costs_path() -> str:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    return os.path.join(_CACHE_DIR, "row_costs.json")


def _load_row_costs() -> dict:
    try:
        with open(_row_costs_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_row_cost(name: str, seconds: float) -> None:
    costs = _load_row_costs()
    costs[name] = round(seconds, 1)
    try:
        with open(_row_costs_path(), "w") as f:
            json.dump(costs, f)
    except OSError:
        pass


def bench_quickstart() -> None:
    """BASELINE config 1: README add(x,y) — compile/keygen/encrypt/run/
    decrypt wall times at real parameters."""
    import concrete_tpu as fhe
    t = {}
    t0 = time.time()

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def add(x, y):
        return x + y

    circuit = add.compile([(i, j) for i in range(4) for j in range(4)])
    t["compile"] = time.time() - t0
    t0 = time.time()
    circuit.keygen()
    t["keygen"] = time.time() - t0
    t0 = time.time()
    enc = circuit.encrypt(2, 3)
    t["encrypt"] = time.time() - t0
    circuit.run(*enc)              # warmup: XLA compile
    t0 = time.time()
    out = circuit.run(*enc)
    t["run"] = time.time() - t0
    t0 = time.time()
    result = circuit.decrypt(out)
    t["decrypt"] = time.time() - t0
    assert result == 5, result
    for k, v in t.items():
        print(f"# {k}: {v:.3f}s", file=sys.stderr)
    print(json.dumps({"metric": "quickstart_add_run_latency",
                      "value": round(t["run"] * 1e3, 1), "unit": "ms",
                      "vs_baseline": 1.0}), flush=True)


def bench_radix16(batch: int = 512) -> None:
    """BASELINE config 4: 16-bit radix arithmetic (add) with per-limb PBS."""
    import concrete_tpu as fhe
    from concrete_tpu.extensions import bigint as bi
    W, NL = 4, 4  # 16 bits as 4x4-bit limbs

    @fhe.compiler({"a": "encrypted", "b": "encrypted"})
    def f(a, b):
        return bi.radix_add([a[..., i] for i in range(NL)],
                            [b[..., i] for i in range(NL)], W)

    rng = np.random.default_rng(0)
    inputset = [(rng.integers(0, 16, (batch, NL)),
                 rng.integers(0, 16, (batch, NL)))]
    t0 = time.time()
    circuit = f.compile(inputset)
    circuit.keygen()
    print(f"# compile+keygen: {time.time() - t0:.1f}s", file=sys.stderr)
    a = rng.integers(0, 1 << 16, batch)
    av = np.stack([np.array(bi.radix_decompose_clear(int(v), W, NL))
                   for v in a])
    b = rng.integers(0, 1 << 16, batch)
    bv = np.stack([np.array(bi.radix_decompose_clear(int(v), W, NL))
                   for v in b])
    enc = circuit.encrypt(av, bv)
    t0 = time.time()
    out = circuit.run(*enc)
    dt = time.time() - t0  # includes jit compile on first call
    t0 = time.time()
    out = circuit.run(*enc)
    dt = time.time() - t0
    dec = circuit.decrypt(*out) if isinstance(out, tuple) else \
        circuit.decrypt(out)
    got = np.array([bi.radix_recompose_clear([d[i] for d in dec], W)
                    for i in range(batch)])
    errs = int((got != ((a + b) % (1 << 16))).sum())
    print(f"# correctness: {batch - errs}/{batch}", file=sys.stderr)
    print(json.dumps({"metric": "radix16_add_throughput",
                      "value": round(batch / dt, 1), "unit": "adds/s",
                      "vs_baseline": round(batch / dt / 100.0, 3)}), flush=True)


def bench_mlp(batch: int = 64) -> None:
    """BASELINE config 5 (single chip): encrypted quantized-MLP inference
    through the full compiler frontend."""
    import numpy as np
    from concrete_tpu.models import QuantizedMLP

    mlp = QuantizedMLP(d_in=8, d_hidden=4, d_out=2, weight_bits=2,
                       activation_bits=2)
    t0 = time.time()
    circuit = mlp.compile(batch_size=batch)
    circuit.keygen()
    print(f"# compile+keygen: {time.time() - t0:.1f}s "
          f"(p={circuit.client_specs.message_bits} bits, "
          f"{circuit.programmable_bootstrap_count} PBS/sample)",
          file=sys.stderr)
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 4, (batch, 8))
    enc = circuit.encrypt(xs)
    circuit.run(enc)                           # warmup/compile
    t0 = time.time()
    out = circuit.run(enc)
    dt = time.time() - t0
    got = np.asarray(circuit.decrypt(out))
    want = np.stack([mlp.infer_clear(x) for x in xs])
    errs = int((got != want).sum())
    print(f"# correctness: {want.size - errs}/{want.size} outputs",
          file=sys.stderr)
    print(json.dumps({"metric": "mlp_inference_throughput",
                      "value": round(batch / dt, 2), "unit": "inferences/s",
                      "vs_baseline": round(batch / dt / 10.0, 3)}), flush=True)


def bench_levelled_llm(small: bool = False) -> None:
    """Reference levelled LLM-ish fixture (BASELINE: end_to_end_fixture/
    benchmarks_cpu/levelled_llm.yaml): encrypted-clear matmul
    (19, 3072) @ (3072, 768) with a 22-bit signed result — a pure levelled
    circuit (no PBS), exercising the u64 contraction path and wide-output
    decodability."""
    import numpy as np
    import concrete_tpu as fhe

    m, k, n = (19, 96, 24) if small else (19, 3072, 768)
    rng = np.random.default_rng(5)
    w = rng.integers(-2, 3, (k, n))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x @ w

    lo, hi = -7, 8
    inputset = [rng.integers(lo, hi, (m, k)) for _ in range(8)]
    # force the extreme rows so bounds cover the true 22-bit range
    ext = np.full((m, k), hi - 1)
    ext[::2] = lo
    inputset.append(ext)
    t0 = time.time()
    circuit = f.compile(inputset)
    circuit.keygen()
    print(f"# compile+keygen: {time.time() - t0:.1f}s "
          f"(output {circuit.client_specs.outputs[0].dtype.bit_width}-bit "
          f"signed, 0 PBS)", file=sys.stderr)
    x = rng.integers(lo, hi, (m, k))
    enc = circuit.encrypt(x)
    circuit.run(enc)                           # warmup/compile
    t0 = time.time()
    out = circuit.run(enc)
    dt = time.time() - t0
    got = np.asarray(circuit.decrypt(out))
    want = x @ w
    errs = int((got != want).sum())
    print(f"# correctness: {want.size - errs}/{want.size} outputs",
          file=sys.stderr)
    print(json.dumps({"metric": "levelled_llm_matmul_latency",
                      "value": round(dt * 1e3, 1), "unit": "ms",
                      "vs_baseline": 1.0}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="small batch / tiny params smoke run")
    ap.add_argument("--check", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="decrypt outputs and verify the LUT was applied")
    ap.add_argument("--params", choices=["4bit", "4bit-tpuopt", "6bit",
                                         "tiny"],
                    default="4bit-tpuopt")
    ap.add_argument("--config", choices=["pbs", "quickstart", "radix16",
                                         "mlp", "llm"],
                    default="pbs", help="BASELINE benchmark config")
    args = ap.parse_args()

    if args.config == "quickstart":
        bench_quickstart()
        return
    if args.config == "radix16":
        bench_radix16()
        return
    if args.config == "mlp":
        bench_mlp()
        return
    if args.config == "llm":
        bench_levelled_llm(small=args.quick)
        return

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
    # disk-cache the benchmark keyset: keygen wall time is dominated by the
    # remote-compile round trip and varies 80-900s run to run
    import hashlib
    import os
    import pickle
    cache_dir = os.path.expanduser("~/.cache/concrete_tpu_bench")
    os.makedirs(cache_dir, exist_ok=True)
    tag = hashlib.sha256(repr(params).encode()).hexdigest()[:16]
    cache_path = os.path.join(cache_dir, f"keys_{tag}.pkl")
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            sk, server = pickle.load(f)
        print(f"# keygen: cached ({time.time() - t0:.1f}s)", file=sys.stderr)
    else:
        sk, server = kg.keygen(rng, params)
        with open(cache_path, "wb") as f:
            pickle.dump((sk, server), f)
        print(f"# keygen: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    ksk = K.pack_ksk(server.ksk, params)
    # noise-budget-aware BSK limb truncation (<=5% of the safe variance);
    # base-32 digits allow dropping 5 of 8 planes (~2x fewer matmul MACs)
    trunc = pp.choose_truncate_limbs(params, p_bits)
    print(f"# truncate_limbs: {trunc}", file=sys.stderr)
    bsk = K.pack_bsk(server.bsk, params, truncate_limbs=trunc)
    lut = np.array([(3 * v + 1) % (1 << p_bits) for v in range(1 << p_bits)],
                   dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut, params.polynomial_size, p_bits))
    msgs = rng.integers(0, 1 << p_bits, batch)
    ct = jnp.asarray(kg.encrypt_lwe_batch(
        rng, sk.lwe_big, ref.encode(msgs, p_bits), params.lwe_std / 4))
    print(f"# pack+encrypt: {time.time() - t0:.1f}s", file=sys.stderr)

    # K.pbs_batch is itself jitted; calling it directly keeps ksk/bsk as
    # runtime arguments.  (Wrapping in another jax.jit(lambda ...) would
    # close over the keys and embed ~100s of MB of constants in the compile
    # payload — the remote compile server rejects that at N>=4096.)
    def run(c):
        return K.pbs_batch(c, ksk, bsk, lut_poly, params, p_bits)
    t0 = time.time()
    out = run(ct)
    int(out[0, -1])  # element fetch: block_until_ready can return early here
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        # fetch one element: guarantees full execution even if the remote
        # backend's block_until_ready is lazy (observed on axon)
        int(run(ct)[0, -1])
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

    _HEADLINE.update({
        "metric": "pbs_throughput_per_chip",
        "value": round(pbs_per_sec, 1),
        "unit": "PBS/s",
        "vs_baseline": round(pbs_per_sec / 1250.0, 3),
    })
    _emit_headline()

    if args.params == "4bit-tpuopt":
        # effective int8 MXU utilization of the headline path: model MACs
        # per PBS (optimizer cost model incl. BSK truncation) x measured
        # rate vs v5e's 197 Tmac/s int8 peak (394 TOPS; the round-3
        # "~400 Tmac/s" figure double-counted ops-per-MAC — the DCE-proof
        # probe's 153 Tmac/s sustained and the Pallas dot's measured
        # 184 Tmac/s are 78%/93% of the real peak)
        from concrete_tpu.optimizer.v0 import cost_pbs_macs
        macs = float(cost_pbs_macs(
            np.array([params.n_small], dtype=np.float64),
            params.glwe_dimension, params.polynomial_size,
            params.pbs_level, params.pbs_base_log, precision=p_bits)[0])
        eff = pbs_per_sec * macs
        print(f"# effective {eff / 1e12:.1f} Tmac/s "
              f"({macs / 1e9:.2f} G MACs/PBS)", file=sys.stderr)
        print(json.dumps({"metric": "tmac_utilization",
                          "value": round(eff / 197e12, 3),
                          "unit": "frac_of_peak",
                          "vs_baseline": round(eff / 197e12, 3)}),
              flush=True)

    if not args.quick and args.params == "4bit-tpuopt":
        # tail rows: single-PBS latency + the feature-exercising configs —
        # the headline row stays first; each tail row is best-effort AND
        # budget-gated so a slow/failed row can't blow the driver budget
        # (rounds 3+4 rc=124) or lose the headline.
        # priority order: a budget squeeze drops the LAST rows first, and
        # the latency row (stable since r3) is the cheapest to lose.
        # budget gating uses MEASURED costs persisted from previous runs
        # (fallbacks are only for a cold cache); headline re-emitted after
        # every row so the final JSON line is always the headline.
        costs = _load_row_costs()
        for name, fn, fallback_s in [
                ("pbs_n4096_fused_ntt", bench_n4096_row, 150),
                ("ntt_polymuls", bench_ntt_polymuls_row, 5),
                ("multi_mixed_precision", bench_multi_row, 150),
                ("wop_tlu_12bit", bench_wop_row, 200),
                ("pbs_latency_b1", bench_latency_row, 40)]:
            est_s = 1.25 * costs.get(name, fallback_s)
            if _remaining() < est_s + 20:
                print(f"# tail row {name} skipped: {_remaining():.0f}s "
                      f"left < {est_s:.0f}s estimate", file=sys.stderr)
                continue
            t_row = time.time()
            try:
                fn()
            except Exception as e:   # noqa: BLE001
                print(f"# tail row {name} failed: {e!r}", file=sys.stderr)
            _save_row_cost(name, time.time() - t_row)
            _emit_headline()


def bench_latency_row() -> None:
    """Single-PBS latency at B=1 (latency-mode blind rotate,
    core/kernels._blind_rotate_xla_latency)."""
    import concrete_tpu.jax_config  # noqa: F401
    import jax
    import jax.numpy as jnp
    from concrete_tpu import params as pp
    from concrete_tpu.core import keygen as kg
    from concrete_tpu.core import kernels as K
    from concrete_tpu.core import refimpl as ref

    params = pp.BENCH_PARAMS_4BIT_TPUOPT
    sk, server = _cached_keyset(params)
    ksk = K.pack_ksk(server.ksk, params)
    trunc = pp.choose_truncate_limbs(params, 4)
    bsk = K.pack_bsk(server.bsk, params, truncate_limbs=trunc)
    rng = np.random.default_rng(7)
    lut = np.array([(3 * v + 1) % 16 for v in range(16)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut, params.polynomial_size, 4))
    ct = jnp.asarray(kg.encrypt_lwe_batch(
        rng, sk.lwe_big, ref.encode(np.array([5]), 4), params.lwe_std / 4))

    def run():
        return int(K.pbs_batch(ct, ksk, bsk, lut_poly, params, 4)[0, -1])

    run()                                      # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    # measure the tunnel round trip inline instead of assuming a constant
    # (round-3 review): the fetch of a trivial jitted scalar bounds the
    # non-compute cost of `run`'s element fetch
    bump = jax.jit(lambda v: v + jnp.uint64(1))   # jit ONCE — a fresh
    tiny = bump(jnp.uint64(1))                    # lambda per call would
    int(tiny)                                     # re-compile every probe
    rtts = []
    for _ in range(5):
        t0 = time.time()
        int(bump(tiny))
        rtts.append(time.time() - t0)
    rtt = min(rtts)
    raw = min(times)
    best = max(raw - rtt, 0.0)
    print(f"# latency B=1: raw {[f'{t*1e3:.0f}' for t in times]} ms, "
          f"measured tunnel RTT {rtt * 1e3:.1f} ms -> adjusted "
          f"{best * 1e3:.1f} ms", file=sys.stderr)
    print(json.dumps({"metric": "pbs_latency_b1",
                      "value": round(best * 1e3, 1), "unit": "ms",
                      "vs_baseline": 1.0}), flush=True)


_N4096_RESULT: dict = {}


def bench_n4096_row(batch: int = 1024) -> None:
    """6-bit N=4096 PBS throughput through the fused single-kernel CRT-NTT
    blind rotate (ops/pallas_fused_ntt.py — the round-3 cliff config;
    CONCRETE_TPU_FUSED_NTT=0 falls back to the banded path)."""
    import concrete_tpu.jax_config  # noqa: F401
    import jax.numpy as jnp
    from concrete_tpu import params as pp
    from concrete_tpu.core import keygen as kg
    from concrete_tpu.core import kernels as K
    from concrete_tpu.core import refimpl as ref

    params = pp.BENCH_PARAMS_6BIT
    sk, server = _cached_keyset(params)
    ksk = K.pack_ksk(server.ksk, params)
    if os.environ.get("CONCRETE_TPU_FUSED_NTT") == "0":
        trunc = pp.choose_truncate_limbs(params, 6)
        bsk = K.pack_bsk(server.bsk, params, truncate_limbs=trunc)
    else:
        from concrete_tpu.ops import pallas_fused_ntt as fn
        t0 = time.time()
        # the host-side per-prime NTT pack costs ~137 s at N=4096 —
        # disk-cache it next to the keyset (deterministic from key+params)
        import jax.numpy as _jnp
        pack_path = os.path.join(_CACHE_DIR, "fusedbsk_n4096_6bit.npz")
        bsk = None
        if os.path.exists(pack_path):
            try:
                z = np.load(pack_path)
                bsk = fn.FusedBSK(
                    spec_val=_jnp.asarray(z["val"]),
                    spec_sh=_jnp.asarray(z["sh"]),
                    primes=tuple(int(p) for p in z["primes"]),
                    trunc_bits=int(z["trunc"]), base_log=int(z["bl"]),
                    levels=int(z["lv"]))
            except Exception:   # noqa: BLE001
                bsk = None
        if bsk is None:
            bsk = fn.pack_bsk_fused(server.bsk, params, message_bits=6)
            try:
                np.savez(pack_path, val=np.asarray(bsk.spec_val),
                         sh=np.asarray(bsk.spec_sh),
                         primes=np.array(bsk.primes, dtype=np.int64),
                         trunc=bsk.trunc_bits, bl=bsk.base_log,
                         lv=bsk.levels)
            except OSError:
                pass
        print(f"# n4096 fused pack: {time.time() - t0:.1f}s "
              f"(primes={len(bsk.primes)}, trunc_bits={bsk.trunc_bits})",
              file=sys.stderr)
    rng = np.random.default_rng(8)
    lut = np.array([(3 * v + 1) % 64 for v in range(64)], dtype=np.uint64)
    lut_poly = jnp.asarray(ref.encode_expand_lut(
        lut, params.polynomial_size, 6))
    msgs = rng.integers(0, 64, batch)
    ct = jnp.asarray(kg.encrypt_lwe_batch(
        rng, sk.lwe_big, ref.encode(msgs, 6), params.lwe_std / 4))

    def run():
        return K.pbs_batch(ct, ksk, bsk, lut_poly, params, 6)

    t0 = time.time()
    out = run()
    int(out[0, -1])
    print(f"# n4096 compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    times = []
    for _ in range(2):
        t0 = time.time()
        int(run()[0, -1])
        times.append(time.time() - t0)
    best = min(times)
    dec = ref.decode(ref.lwe_decrypt(sk.lwe_big, np.asarray(out)), 6)
    errs = int((dec != (3 * msgs + 1) % 64).sum())
    print(f"# n4096 correctness: {batch - errs}/{batch}", file=sys.stderr)
    rate = batch / best
    _N4096_RESULT.update(rate=rate, params=params)
    print(json.dumps({"metric": "pbs_throughput_n4096_6bit",
                      "value": round(rate, 1), "unit": "PBS/s",
                      "vs_baseline": round(rate / 1250.0, 3)}), flush=True)


def bench_ntt_polymuls_row() -> None:
    """Negacyclic NTT polymul rate (BASELINE.md row 2), derived from the
    fused-NTT N=4096 row: each blind-rotate step performs Cin*(k+1)
    degree-N negacyclic polynomial products per ciphertext.
    vs_baseline reports utilization against the kernel's own MXU
    speed-of-light for the same products (int8 limb MACs at the measured
    ~150 Tmac/s production dot rate, tools/probe_dot_rate.py)."""
    if not _N4096_RESULT:
        print("# ntt_polymuls skipped: no fused n4096 result", file=sys.stderr)
        return
    p = _N4096_RESULT["params"]
    kp1 = p.glwe_dimension + 1
    cin = p.pbs_level * kp1
    n = p.polynomial_size
    rate = _N4096_RESULT["rate"] * p.n_small * cin * kp1
    # per-polymul MAC cost in the fused four-step kernel (fwd amortized
    # over kp1 outputs + inv amortized over Cin inputs), 3 primes
    n1, n2 = n // 128, 128
    dl = 3
    macs = 3 * ((dl * 4 * n * n1 + 16 * n * n2) / kp1
                + (4 * 4 * n * n1 + 16 * n * n2) / cin)
    sol = 150e12 / macs            # polymuls/s at the measured dot rate
    print(f"# ntt polymuls: {rate:.3e}/s at N={n} "
          f"(MXU speed-of-light ~{sol:.3e}/s)", file=sys.stderr)
    print(json.dumps({"metric": "ntt_polymuls_per_sec",
                      "value": round(rate, 1), "unit": "polymul/s",
                      "vs_baseline": round(rate / sol, 3)}), flush=True)


def _cached_keyset(params):
    import hashlib
    import os
    import pickle
    cache_dir = os.path.expanduser("~/.cache/concrete_tpu_bench")
    os.makedirs(cache_dir, exist_ok=True)
    tag = hashlib.sha256(repr(params).encode()).hexdigest()[:16]
    cache_path = os.path.join(cache_dir, f"keys_{tag}.pkl")
    from concrete_tpu.core import keygen as kg
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    pair = kg.keygen(np.random.default_rng(2026), params)
    with open(cache_path, "wb") as f:
        pickle.dump(pair, f)
    return pair


def bench_wop_row(batch: int = 128) -> None:
    """12-bit TLU through CRT-WoP-PBS (per-residue bit extraction +
    circuit bootstrap + one vertical packing per output residue) at
    optimizer-chosen 128-bit parameters, through the compiler frontend.

    CRT over (7, 8, 9, 11) is the reference's own lowering for >= ~9-bit
    TLUs (FHEToTFHECrt.cpp; the runtime kernel is literally
    memref_wop_pbs_crt_buffer, wrappers.cpp:855).  The monolithic
    single-partition WoP alternative needs N=16384 / cbs_level-8
    parameters whose working set exceeds this host's 128 GB even
    batch-chunked (OOM-killed three times in round 5 — RESULTS.md);
    the CRT cut solves to N=1024-class parameters."""
    import concrete_tpu as fhe
    from concrete_tpu.extensions import crt

    moduli = (7, 8, 9, 11)                   # product 5544 >= 2^12
    prod = int(np.prod(moduli))
    full = np.array([(3 * (v % 4096) + 1) % 256 for v in range(prod)],
                    dtype=np.int64)

    @fhe.compiler({"r0": "encrypted", "r1": "encrypted",
                   "r2": "encrypted", "r3": "encrypted"})
    def f(r0, r1, r2, r3):
        return crt.crt_tlu((r0, r1, r2, r3), full, moduli)

    rng = np.random.default_rng(9)
    xs = rng.integers(0, 1 << 12, batch)
    res = np.stack([np.array(crt.crt_encode_clear(int(v), moduli))
                    for v in xs])            # (B, 4)
    t0 = time.time()
    circuit = f.compile(
        [tuple(res[:, j] for j in range(len(moduli)))])
    circuit.keygen(seed=12)
    print(f"# wop12: compile+keygen {time.time() - t0:.1f}s "
          f"(N={circuit.client_specs.params.polynomial_size})",
          file=sys.stderr)
    enc = circuit.encrypt(*(res[:, j] for j in range(len(moduli))))
    circuit.run(*enc)
    t0 = time.time()
    out = circuit.run(*enc)
    dt = time.time() - t0
    dec = circuit.decrypt(out)
    got = np.array([crt.crt_decode_clear([int(d[i]) for d in dec], moduli)
                    for i in range(batch)])
    want = (3 * xs + 1) % 256
    errs = int((got != want).sum())
    print(f"# wop12 correctness: {batch - errs}/{batch}", file=sys.stderr)
    print(json.dumps({"metric": "wop_tlu_12bit_throughput",
                      "value": round(batch / dt, 2), "unit": "TLU/s",
                      "vs_baseline": 1.0}), flush=True)


def bench_multi_row(batch: int = 2048) -> None:
    """Mixed-precision circuit (2-bit + 7-bit TLUs) under the MULTI
    parameter-selection strategy: each PBS on its own keyset."""
    import concrete_tpu as fhe

    small = fhe.LookupTable([v % 4 for v in range(4)])
    big = fhe.LookupTable([(5 * v + 2) % 64 for v in range(64)])

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return small[x] + big[y]

    rng = np.random.default_rng(10)
    xs = rng.integers(0, 4, batch)
    ys = rng.integers(0, 64, batch)
    cfg = fhe.Configuration(
        parameter_selection_strategy=fhe.ParameterSelectionStrategy.MULTI)
    t0 = time.time()
    cal_x = xs.copy(); cal_x[:2] = [0, 3]
    cal_y = ys.copy(); cal_y[:2] = [0, 63]
    circuit = f.compile([(cal_x, cal_y), (xs, ys)], cfg)
    circuit.keygen(seed=13)
    print(f"# multi: compile+keygen {time.time() - t0:.1f}s "
          f"(partitions: {sorted(circuit.client_specs.partitions or {})})",
          file=sys.stderr)
    enc = circuit.encrypt(xs, ys)
    circuit.run(*enc)
    t0 = time.time()
    out = circuit.run(*enc)
    dt = time.time() - t0
    got = np.asarray(circuit.decrypt(out))
    want = xs % 4 + (5 * ys + 2) % 64
    errs = int((got != want).sum())
    print(f"# multi correctness: {batch - errs}/{batch}", file=sys.stderr)
    # 2 PBS per sample
    print(json.dumps({"metric": "multi_mixed_precision_pbs_throughput",
                      "value": round(2 * batch / dt, 1), "unit": "PBS/s",
                      "vs_baseline": round(2 * batch / dt / 1250.0, 3)}), flush=True)


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_sigterm)
    main()
