"""Simulation-vs-model consistency: the simulator's error rate matches the
noise model's p_error prediction (the reference's check_simulation analog)."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def test_simulation_error_rate_matches_model():
    table = fhe.LookupTable(list(range(16)))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    circuit = f.compile(range(16), CFG)
    pe_model = circuit.p_error
    assert 1e-4 < pe_model < 0.2  # 4-bit at tiny params is noisy (~1-2%)

    rng = np.random.default_rng(0)
    trials = 3000
    errors = 0
    xs = rng.integers(0, 16, trials)
    for x in xs:
        if circuit.simulate(int(x)) != int(x):
            errors += 1
    measured = errors / trials
    # agree within a factor ~3 (binomial noise + tail approximations)
    assert measured < max(3 * pe_model, 0.02), (measured, pe_model)
    if pe_model > 3e-3:
        assert measured > pe_model / 5, (measured, pe_model)


def test_simulation_tracks_leveled_noise_growth():
    """Summing many ciphertexts grows variance; the simulator must show a
    higher error rate for deeper sums."""
    @fhe.compiler({"x": "encrypted"})
    def shallow(x):
        t = fhe.LookupTable(list(range(8)))
        return t[x]

    circuit = shallow.compile(range(8), CFG)
    # shallow circuit exists and simulates fine
    assert circuit.simulate(3) in range(8)


def test_simulation_multivariate_error_rate():
    """The multivariate (packed TLU) simulation branch samples real PBS
    decision noise: error rate within a factor of the model (round-2
    review finding: multivariate previously simulated noiselessly)."""
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return fhe.multivariate(lambda a, b: (a + 2 * b) % 4)(x, y)

    circuit = f.compile([(i % 4, (i // 4) % 4) for i in range(16)], CFG)
    pe_model = circuit.p_error
    rng = np.random.default_rng(1)
    trials = 2000
    errors = 0
    for _ in range(trials):
        a, b = int(rng.integers(0, 4)), int(rng.integers(0, 4))
        if circuit.simulate(a, b) != (a + 2 * b) % 4:
            errors += 1
    measured = errors / trials
    # must show SOME errors when the model predicts a noisy packed TLU,
    # and not wildly more than predicted
    assert measured < max(4 * pe_model, 0.03), (measured, pe_model)
    if pe_model > 5e-3:
        assert errors > 0, "multivariate simulation never errs " \
                           f"(model p_error {pe_model:.3g})"


def test_detect_overflow_in_simulation():
    """Configuration.detect_overflow_in_simulation warns when a value
    escapes its encoding (silent wrap in real FHE)."""
    import warnings

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 6

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            detect_overflow_in_simulation=True)
    circuit = f.compile(range(2), cfg)     # bounds say x in [0,1], out <= 7
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        circuit.simulate(3)                # out-of-inputset input: 9 > 7
    assert any("overflow" in str(w.message) for w in caught), \
        [str(w.message) for w in caught]
    # in-range values stay silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        circuit.simulate(1)
    assert not any("overflow" in str(w.message) for w in caught)


def test_simulation_noise_correlation():
    """x + x doubles the SAME noise sample (4x variance) while x + y sums
    independent samples (2x): the correlated circuit must flip decisions
    measurably more often (regression: variance propagation treated
    correlated operands as independent, giving both 2x)."""
    import dataclasses

    from concrete_tpu.simulation import simulate_graph

    # inflate the fresh-input noise so it dominates the decision margin
    params = dataclasses.replace(TEST_PARAMS_TINY, glwe_std=0.03)
    cfg = fhe.Configuration(forced_parameters=params)
    table = fhe.LookupTable([0, 1, 2, 3, 0, 1, 2, 3])

    @fhe.compiler({"x": "encrypted"})
    def correlated(x):
        return table[x + x]

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def independent(x, y):
        return table[x + y]

    c1 = correlated.compile([0, 1, 2, 3], cfg)
    c2 = independent.compile([(i, j) for i in range(4) for j in range(4)],
                             cfg)
    rng = np.random.default_rng(11)
    n = 600
    flips1 = sum(
        int(simulate_graph(c1.graph, c1.client_specs, 1, rng=rng)) != 2
        for _ in range(n))
    flips2 = sum(
        int(simulate_graph(c2.graph, c2.client_specs, 1, 1, rng=rng)) != 2
        for _ in range(n))
    # std 0.06 vs 0.0424 against a 0.0625 margin: ~0.30 vs ~0.14 expected
    assert flips1 > flips2 + n * 0.05, (flips1, flips2)
