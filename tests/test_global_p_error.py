"""Global p_error calibration search (reference V0Parameters.cpp:70-119
getSolutionWithGlobalPError): the per-PBS request shrinks only until the
ACHIEVED global error meets the budget, instead of the old union-bound
request global/n_pbs — large circuits get strictly cheaper parameters."""

import numpy as np

import concrete_tpu as fhe
from concrete_tpu.optimizer.v0 import (achieved_p_error, cost_pbs_macs,
                                       p_error_of_variance,
                                       pattern_variance)


def _tlu_circuit(cfg, count=64, width=4):
    table = fhe.LookupTable([(3 * v + 1) % (1 << width)
                             for v in range(1 << width)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    inputset = [np.random.randint(0, 1 << width, (count,))
                for _ in range(10)]
    inputset.append(np.full((count,), (1 << width) - 1))
    return f.compile(inputset, cfg)


def _pbs_cost(params):
    return float(cost_pbs_macs(
        np.array([params.n_small], dtype=np.float64), params.glwe_dimension,
        params.polynomial_size, params.pbs_level, params.pbs_base_log)[0])


def test_calibrated_global_p_error_is_cheaper_than_union_bound():
    n, target = 64, 0.4
    c_cal = _tlu_circuit(fhe.Configuration(global_p_error=target), count=n)
    c_ub = _tlu_circuit(fhe.Configuration(p_error=target / n), count=n)
    p_cal = c_cal.client_specs.params
    p_ub = c_ub.client_specs.params
    # the calibrated solution still meets the global budget (exact product
    # criterion over the n PBS instances)...
    # the per-element decisions: the TLU input decodes with full KS+MS
    # (fresh-input noise), the output decodes the raw BR noise (no KS/MS
    # before a client decrypt — round-5 corrected noise model)
    ach = achieved_p_error(p_cal, ((4, 1.0, 0.0),),
                           noise_only=((4, 0.0, 1.0),))
    assert 1.0 - (1.0 - ach) ** n <= target * 1.0001, (ach,)
    # ...at a strictly cheaper per-PBS cost than the union-bound request
    assert _pbs_cost(p_cal) < _pbs_cost(p_ub), (p_cal, p_ub)


def test_tight_global_p_error_still_meets_budget():
    n, target = 50, 0.001
    c = _tlu_circuit(fhe.Configuration(global_p_error=target), count=n)
    ach = achieved_p_error(c.client_specs.params, ((4, 1.0, 0.0),),
                           noise_only=((4, 0.0, 1.0),))
    assert 1.0 - (1.0 - ach) ** n <= target * 1.0001, (ach,)


def _multi_circuit(cfg, count=64):
    """Tensor 2-bit + 4-bit TLU circuit (2*count PBS) under MULTI."""
    table_small = fhe.LookupTable([3, 1, 2, 0])
    table_big = fhe.LookupTable([(i * 7) % 16 for i in range(16)])

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return table_small[x] + table_big[y]

    rng = np.random.default_rng(11)
    xs = rng.integers(0, 4, count)
    ys = rng.integers(0, 16, count)
    xs[:2] = [0, 3]
    ys[:2] = [0, 15]
    return f.compile([(xs, ys)], cfg)


def _achieved_global(circuit) -> float:
    """Exact-product achieved global error of a compiled MULTI circuit,
    recomputed from its specs + graph (the same quantity the compiler's
    multi calibration loop bounds, multi.achieved_global_p_error)."""
    import math

    from concrete_tpu.compilation.multi import (_tlu_instructions,
                                                partition_pattern_split)
    specs = circuit.client_specs
    patterns, _ = partition_pattern_split(circuit.graph)
    log_ok = 0.0
    for pid_in, _pid_out, _p, weight, _nb in _tlu_instructions(circuit.graph):
        pr = specs.partitions[pid_in]
        ach = achieved_p_error(pr, tuple(patterns[pid_in].native),
                               tuple(patterns[pid_in].wide_in))
        log_ok += weight * math.log1p(-min(ach, 1.0 - 1e-12))
    return -math.expm1(log_ok)


def test_multi_calibrated_global_p_error_cheaper_than_union_bound():
    """VERDICT r4 #5: the MULTI planner gets the same exact-product
    calibration mono has — strictly cheaper parameters than the
    union-bound request at the same global failure budget."""
    count, target = 64, 0.8
    n_pbs = 2 * count
    multi = fhe.ParameterSelectionStrategy.MULTI
    c_cal = _multi_circuit(fhe.Configuration(
        parameter_selection_strategy=multi, global_p_error=target),
        count=count)
    c_ub = _multi_circuit(fhe.Configuration(
        parameter_selection_strategy=multi, p_error=target / n_pbs),
        count=count)
    assert c_cal.client_specs.is_multi and c_ub.client_specs.is_multi
    # budget met under the exact-product criterion
    assert _achieved_global(c_cal) <= target * 1.0001
    # ...at strictly cheaper total PBS cost than the union-bound request
    def total_cost(c):
        return sum(_pbs_cost(p) for p in c.client_specs.partitions.values())
    assert total_cost(c_cal) < total_cost(c_ub), (
        c_cal.client_specs.partitions, c_ub.client_specs.partitions)


def test_p_error_of_variance_inverts_safe_bound():
    from concrete_tpu.optimizer.v0 import safe_variance_bound
    for p in (2, 5, 8):
        for pe in (1e-3, 6.3e-5, 1e-7):
            v = safe_variance_bound(p, pe)
            got = p_error_of_variance(p, v)
            assert abs(got - pe) / pe < 1e-3, (p, pe, got)


def test_pattern_variance_positive_and_monotone():
    from concrete_tpu.params import BENCH_PARAMS_4BIT_TPUOPT as P
    v1 = pattern_variance(P, (4, 1.0, 1.0))
    v4 = pattern_variance(P, (4, 1.0, 16.0))
    assert 0 < v1 < v4
