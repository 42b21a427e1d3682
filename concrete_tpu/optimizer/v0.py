"""V0 parameter optimizer: pick crypto parameters for the KS->BR atomic
pattern given (precision, norm2) under a p_error constraint.

The TPU-native re-implementation of the reference optimizer's atomic-pattern
search (compilers/concrete-optimizer/concrete-optimizer/src/optimization/
atomic_pattern.rs and dag/solo_key/optimize.rs:405): same noise model
(concrete_tpu.params == concrete-cpu noise-model), same feasibility predicate
(noise_br * norm2^2 + noise_ks + noise_ms <= safe_variance), but the *cost
model* counts int8 MXU MACs of our banded-matmul kernels instead of CPU FFT
complexity — the optimizer picks what is fast on a TPU.

Vectorized numpy search over (k, logN, n, br, ks); milliseconds per query,
lru-cached.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from concrete_tpu import params as pp
from concrete_tpu.core import limbs as lb


def kappa_of_p_error(p_error: float) -> float:
    """sigma scale with P(|x| > kappa*sigma) = p_error (reference error.rs)."""
    # invert erfc by bisection (p_error in (0, 1)); avoids a scipy dependency
    lo, hi = 0.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(mid / math.sqrt(2.0)) > p_error:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def safe_variance_bound(precision: int, p_error: float) -> float:
    """Reference error.rs safe_variance_bound_2padbits (torus units)."""
    margin = 2.0 ** (-(precision + 2))
    return (margin / kappa_of_p_error(p_error)) ** 2


def cost_pbs_macs(n, k: int, big_n: int, br_l: int, br_b: int,
                  precision: int = None, p_error: float = 6.3e-5):
    """int8 MACs of one PBS blind rotate with the banded-matmul kernel.

    When `precision` is given, the cost accounts for noise-budget-aware BSK
    limb truncation (kept weight limb planes = 8 - t_max): small gadget
    bases tolerate deep truncation, which is why the optimizer prefers them
    on TPU (see params.choose_truncate_limbs)."""
    from concrete_tpu import params as pp
    a_limbs = lb.num_digit_limbs(br_b)
    keep = 8
    if precision is not None:
        budget = safe_variance_bound(precision, p_error) * 0.05
        for t in range(1, 7):
            v = pp.variance_bsk_limb_truncation(int(np.max(n)), k, big_n,
                                                br_b, br_l, t)
            if v <= budget:
                keep = 8 - t
            else:
                break
    return n * float((k + 1) * br_l * (k + 1) * a_limbs * keep) * big_n ** 2


def cost_ks_macs(n_big: int, n_small, ks_l: int, ks_b: int):
    a_limbs = lb.num_digit_limbs(ks_b)
    return float(n_big) * ks_l * a_limbs * 8 * (n_small + 1)


def optimize_v0(precision: int, norm2: int = 1, p_error: float = 6.3e-5,
                security_level: int = 128) -> pp.CryptoParams:
    """Minimal-cost feasible CryptoParams for (precision, norm2, p_error)."""
    return optimize_v0_multi(((precision, norm2),), p_error=p_error,
                             security_level=security_level)


def pareto_patterns(patterns) -> tuple[tuple[int, int], ...]:
    """Drop (p, norm2) patterns dominated by another (both smaller-or-equal):
    a dominated pattern's feasibility constraint is implied."""
    pats = sorted(set((int(p), int(n)) for p, n in patterns))
    keep = []
    for p, n in pats:
        if not any(p2 >= p and n2 >= n and (p2, n2) != (p, n)
                   for p2, n2 in pats):
            keep.append((p, n))
    return tuple(keep)


@functools.lru_cache(maxsize=None)
def optimize_v0_multi(patterns: tuple, p_error: float = 6.3e-5,
                      security_level: int = 128) -> pp.CryptoParams:
    """Minimal-cost CryptoParams feasible for EVERY (precision, norm2)
    atomic pattern simultaneously.

    The multi-precision analog of the reference's DAG-mono optimization
    (dag/solo_key/optimize.rs:405): each TLU and each output contributes a
    constraint  v_br*norm2_i^2 + v_ks + v_ms < safe_variance(p_i); params
    must satisfy the intersection, and cost is the per-PBS cost (identical
    across patterns under one keyset, so the cheapest feasible point wins).
    """
    patterns = pareto_patterns(patterns)
    p_max = max(p for p, _ in patterns)
    safe_vars = [safe_variance_bound(p, p_error) for p, _ in patterns]
    norm2_sqs = [float(n) ** 2 for _, n in patterns]
    # the BSK-truncation budget in the cost model must hold for every
    # pattern: use the tightest precision
    best = None
    best_cost = math.inf

    ns = np.arange(450, 1400, 2, dtype=np.float64)
    var_lwe = np.array([pp.minimal_variance_lwe(int(n), security_level)
                        for n in ns])

    ks_candidates = [(l, b) for l in (1, 2, 3, 4, 5, 6, 8)
                     for b in range(2, 9) if l * b <= 40]
    br_candidates = [(l, b) for l in (1, 2, 3, 4)
                     for b in range(5, 24) if l * b <= 53]

    for log_n in range(8, 16):
        big_n = 1 << log_n
        if big_n < (1 << (p_max + 1)):
            continue  # LUT mega-cases must be even: N >= 2^(p+1)
        v_ms = ((1.0 / 12.0 + ns / 24.0) / (2.0 ** (log_n + 1)) ** 2
                + (-1.0 / 12.0 + ns / 48.0) / 2.0 ** 128)
        if any(v_ms.min() > sv for sv in safe_vars):
            continue
        for k in range(1, 7):
            n_big = k * big_n
            if n_big > (1 << 17):
                continue
            var_bsk = pp.minimal_variance_glwe(k, big_n, security_level)
            # precompute keyswitch variance per candidate (vector over ns)
            v_ks_all = {}
            for ks_l, ks_b in ks_candidates:
                v_ks_all[(ks_l, ks_b)] = _variance_keyswitch_vec(
                    n_big, ks_b, ks_l, var_lwe)
            for br_l, br_b in br_candidates:
                v_cmux = pp.variance_external_product(k, big_n, br_b, br_l,
                                                      var_bsk)
                v_br_unit = ns * v_cmux
                base_ok = np.ones_like(ns, dtype=bool)
                for sv, n2sq in zip(safe_vars, norm2_sqs):
                    base_ok &= v_br_unit * n2sq + v_ms < sv
                if not base_ok.any():
                    continue
                c_br = cost_pbs_macs(ns, k, big_n, br_l, br_b,
                                     precision=p_max, p_error=p_error)
                if c_br[base_ok].min() >= best_cost:
                    continue
                for (ks_l, ks_b), v_ks in v_ks_all.items():
                    feasible = np.ones_like(ns, dtype=bool)
                    for sv, n2sq in zip(safe_vars, norm2_sqs):
                        feasible &= v_br_unit * n2sq + v_ks + v_ms < sv
                    if not feasible.any():
                        continue
                    cost = c_br + cost_ks_macs(n_big, ns, ks_l, ks_b)
                    cost = np.where(feasible, cost, math.inf)
                    i = int(np.argmin(cost))
                    if cost[i] < best_cost:
                        best_cost = float(cost[i])
                        best = pp.CryptoParams(
                            n_small=int(ns[i]), glwe_dimension=k,
                            polynomial_size=big_n, pbs_level=br_l,
                            pbs_base_log=br_b, ks_level=ks_l,
                            ks_base_log=ks_b,
                            lwe_std=math.sqrt(float(var_lwe[i])),
                            glwe_std=math.sqrt(var_bsk),
                            security_level=security_level)
    if best is None:
        raise ValueError(
            f"no feasible parameters for patterns={patterns}, "
            f"p_error={p_error}")
    return best


def _variance_keyswitch_vec(n_big: int, log2_base: int, level: int,
                            variance_ksk: np.ndarray) -> np.ndarray:
    """Vectorized reference keyswitch variance (params.variance_keyswitch)."""
    q_sq = 2.0 ** 128
    var_key = 0.25 / q_sq
    sq_exp = 0.25 / q_sq
    base = 2.0 ** log2_base
    b2l = 2.0 ** (2 * log2_base * level)
    res_2 = (q_sq / (12.0 * b2l) - 1.0 / 12.0) * (var_key + sq_exp)
    res_3 = 0.25 * var_key
    res_4 = level * variance_ksk * (base ** 2 + 2.0) / 12.0
    return n_big * (res_2 + res_3 + res_4)
