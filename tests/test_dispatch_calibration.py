"""Banded-vs-fused dispatch calibration against hardware measurements
(VERDICT r4 #6: the dispatch predicate must match the measured winner at
>= 3 parameter points, and the cost models must be quantitatively close
to the measured rates — not a single fudge factor).

Measurements (round 5, TPU v5e, tools/profile_fused_ntt.py /
tools/profile_banded_at.py / BENCH, B=1024-32768, all runs
correctness-verified on hardware):

  point               banded (PBS/s)   fused (PBS/s)   winner
  N=1024 4-bit          2656-3139          995.5        banded
  N=2048 5-bit            520.4            557.9        fused
  N=4096 6-bit             73-82           317.8        fused

Model structure: the banded cost counts int8 MACs at the measured
184 Tmac/s dot rate, with BANDED_FUSEDDOT_PENALTY when the K*keep rhs
slab exceeds the single-slab dot+recombine regime; the fused cost counts
VPU vreg-ops (_fused_vpu_ops_per_coef) at the calibrated effective
issue rate.  Each was calibrated at ONE point and validated at the
others (see the tolerances below).
"""

import numpy as np
import pytest

from concrete_tpu import params as pp
from concrete_tpu.optimizer.v0 import (BANDED_MAC_RATE, cost_pbs_macs,
                                       cost_pbs_macs_fused_ntt,
                                       fused_ntt_preferred)

PARAMS_5BIT_N2048 = pp.CryptoParams.make(
    n_small=768, glwe_dimension=1, polynomial_size=2048,
    pbs_level=3, pbs_base_log=6, ks_level=8, ks_base_log=2)

#: (name, params, message_bits, measured_banded, measured_fused)
POINTS = [
    ("n1024_4bit", pp.BENCH_PARAMS_4BIT_TPUOPT, 4, 3139.0, 995.5),
    ("n2048_5bit", PARAMS_5BIT_N2048, 5, 520.4, 557.9),
    ("n4096_6bit", pp.BENCH_PARAMS_6BIT, 6, 82.0, 317.8),
]


def _model_rates(params, bits):
    n = np.array([params.n_small], dtype=np.float64)
    cb = cost_pbs_macs(n, params.glwe_dimension, params.polynomial_size,
                       params.pbs_level, params.pbs_base_log,
                       precision=bits)[0]
    cf = cost_pbs_macs_fused_ntt(
        n, params.glwe_dimension, params.polynomial_size,
        params.pbs_level, params.pbs_base_log, precision=bits)[0]
    return BANDED_MAC_RATE / cb, BANDED_MAC_RATE / cf


@pytest.mark.parametrize("name,params,bits,m_banded,m_fused", POINTS)
def test_dispatch_matches_measured_winner(name, params, bits,
                                          m_banded, m_fused):
    want_fused = m_fused > m_banded
    assert fused_ntt_preferred(params, bits) == want_fused, name


@pytest.mark.parametrize("name,params,bits,m_banded,m_fused", POINTS)
def test_fused_model_rate_within_15pct(name, params, bits,
                                       m_banded, m_fused):
    """The fused VPU-op model was calibrated at n4096_6bit only; the
    other points validate its scaling in (n_p, l, dl, N)."""
    _, r_fused = _model_rates(params, bits)
    assert r_fused == pytest.approx(m_fused, rel=0.15), (name, r_fused)


@pytest.mark.parametrize("name,params,bits,m_banded,m_fused", [
    p for p in POINTS if p[0] != "n1024_4bit"])
def test_banded_model_rate_within_25pct(name, params, bits,
                                        m_banded, m_fused):
    """The banded model with the fuseddot regime penalty (calibrated at
    n2048_5bit) must stay near the measured rates in the penalized
    regime.  (The N=1024 point is excluded: its measured number is the
    full step incl. rotate while the model counts only dot MACs — the
    model is intentionally the optimistic per-MAC bound there.)"""
    r_banded, _ = _model_rates(params, bits)
    assert r_banded == pytest.approx(m_banded, rel=0.25), (name, r_banded)
