#!/usr/bin/env python
"""v0-parameters analog: regenerate and diff the V0 parameter table.

The reference ships a `v0-parameters` CLI that regenerates golden tables of
optimizer solutions per (precision, log-norm2) and diffs them against
committed refs (compilers/concrete-optimizer/v0-parameters/src/lib.rs,
ref/v0_last_128).  This tool does the same for the TPU optimizer:

  generate           print the table for the TPU cost model
  diff [GOLDEN]      regenerate and diff against the committed golden
                     (tools/ref/v0_tpu_128.txt); exit 1 on drift
  check-reference F  parse a reference-format table (e.g. the upstream
                     v0_last_128) and validate every row's parameters are
                     noise-feasible under our hardware-validated noise
                     model, within a tolerance band on the stated p_error

The chosen parameters legitimately differ from the reference's (the cost
model is TPU int8-MXU MACs, not CPU FFT nanoseconds); what must agree is
the NOISE model, which check-reference asserts row by row.
"""

from __future__ import annotations

import argparse
import math
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_GOLDEN = Path(__file__).resolve().parent / "ref" / "v0_tpu_128.txt"
DEFAULT_P_ERROR = 6.3e-5


def _cost_macs(params, precision: int, p_error: float) -> int:
    # dispatch-aware: effective MACs of whichever blind-rotate kernel the
    # runtime would pick (same min the optimizer's search uses)
    import numpy as np

    from concrete_tpu.optimizer.v0 import (cost_ks_macs, cost_pbs_macs,
                                           cost_pbs_macs_fused_ntt)
    args = (params.glwe_dimension, params.polynomial_size,
            params.pbs_level, params.pbs_base_log)
    n = np.array([params.n_small], dtype=np.float64)
    pbs = min(float(cost_pbs_macs(n, *args, precision=precision,
                                  p_error=p_error)[0]),
              float(cost_pbs_macs_fused_ntt(n, *args, precision=precision,
                                            p_error=p_error)[0]))
    ks = cost_ks_macs(params.n_big, params.n_small, params.ks_level,
                      params.ks_base_log)
    return int(pbs + ks)


def generate(precisions, log_norm2s, p_error: float,
             security_level: int = 128) -> str:
    from concrete_tpu.optimizer.v0 import optimize_v0

    lines = [
        f"security level: {security_level}",
        f"target p_error: {p_error:.1e}",
        "per precision and log norm2:",
        "",
    ]
    for p in precisions:
        lines.append(f"  - {p}: # bits")
        lines.append("    -ln2:   k, logN,    n, br_l,br_b, ks_l,ks_b,"
                     "      cost_macs, p_error")
        for ln2 in log_norm2s:
            try:
                sol = optimize_v0(p, norm2=2 ** ln2, p_error=p_error,
                                  security_level=security_level)
            except Exception:
                sol = None
            if sol is None:
                lines.append(f"    - {ln2:<2}: no solution")
                continue
            pe = sol.p_error(p, norm2=2 ** ln2)
            lines.append(
                f"    - {ln2:<2}: {sol.glwe_dimension:3d}, "
                f"{sol.log2_polynomial_size:4d}, {sol.n_small:4d}, "
                f"{sol.pbs_level:4d}, {sol.pbs_base_log:3d},  "
                f"{sol.ks_level:4d}, {sol.ks_base_log:3d}, "
                f"{_cost_macs(sol, p, p_error):14d}, {pe:.1e}")
        lines.append("")
    return "\n".join(lines) + "\n"


_REF_ROW = re.compile(
    r"-\s*(\d+)\s*:\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+),"
    r"\s*(\d+),\s*(\d+),\s*[\d.e+-]+,\s*([\d.e+-]+)")


def check_reference(path: Path, tolerance: float = 2.0) -> int:
    """Validate a reference-format golden table against our noise model.

    For every row (precision, log-norm2 -> k, logN, n, br, ks, p_error),
    rebuild the parameter set with curve-minimal noise and require our
    predicted p_error to fall within `tolerance`x of the stated one.
    Returns the number of violations.
    """
    from concrete_tpu.params import CryptoParams

    text = path.read_text()
    precision = None
    checked = violations = 0
    worst = (1.0, None)
    for raw in text.splitlines():
        header = re.match(r"\s*-\s*(\d+)\s*:\s*#\s*bits", raw)
        if header:
            precision = int(header.group(1))
            continue
        row = _REF_ROW.search(raw)
        if not row or precision is None:
            continue
        ln2, k, log_n, n, br_l, br_b, ks_l, ks_b, pe_txt = row.groups()
        params = CryptoParams.make(
            n_small=int(n), glwe_dimension=int(k),
            polynomial_size=1 << int(log_n), pbs_level=int(br_l),
            pbs_base_log=int(br_b), ks_level=int(ks_l),
            ks_base_log=int(ks_b))
        stated = float(pe_txt)
        # the reference runs the BR through an f64 FFT; mirror its
        # fft noise term rather than our exact-int8 default
        predicted = params.p_error(precision, norm2=2 ** int(ln2),
                                   fft_precision=53)
        checked += 1
        ratio = max(predicted / stated, stated / max(predicted, 1e-300))
        if ratio > worst[0]:
            worst = (ratio, (precision, int(ln2)))
        if not (stated / tolerance <= predicted <= stated * tolerance):
            violations += 1
            print(f"  VIOLATION p={precision} ln2={ln2}: "
                  f"stated {stated:.2e}, predicted {predicted:.2e}")
    print(f"checked {checked} rows, {violations} violations, "
          f"worst ratio {worst[0]:.2f}x at {worst[1]}")
    return violations


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_grid(p):
        p.add_argument("--precisions", default="1-8")
        p.add_argument("--log-norm2", default="0-16", dest="log_norm2")
        p.add_argument("--p-error", type=float, default=DEFAULT_P_ERROR)

    add_grid(sub.add_parser("generate"))
    dp = sub.add_parser("diff")
    add_grid(dp)
    dp.add_argument("golden", nargs="?", default=str(DEFAULT_GOLDEN))
    cp = sub.add_parser("check-reference")
    cp.add_argument("table")
    cp.add_argument("--tolerance", type=float, default=2.0)

    args = ap.parse_args(argv)

    def parse_range(spec):
        lo, _, hi = spec.partition("-")
        return range(int(lo), int(hi or lo) + 1)

    if args.cmd == "generate":
        sys.stdout.write(generate(parse_range(args.precisions),
                                  parse_range(args.log_norm2),
                                  args.p_error))
        return 0
    if args.cmd == "diff":
        fresh = generate(parse_range(args.precisions),
                         parse_range(args.log_norm2), args.p_error)
        golden = Path(args.golden).read_text()
        if fresh == golden:
            print("parameter table unchanged")
            return 0
        import difflib
        sys.stdout.writelines(difflib.unified_diff(
            golden.splitlines(True), fresh.splitlines(True),
            "golden", "regenerated"))
        return 1
    if args.cmd == "check-reference":
        return 1 if check_reference(Path(args.table),
                                    args.tolerance) else 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
