"""Statistical p_error budget tests.

The reference treats cryptographic failures statistically: TestErrorRate in
tests/end_to_end_fixture/EndToEndFixture.h:47-50 runs nb_repetition times
and asserts the failure count against the global_p_error budget, and the
Python suite's check_execution retries within the budget
(tests/conftest.py:260).  Here we assert the observed PBS failure rate
matches the noise model's prediction within binomial bounds — the test
fails if the noise model (or a kernel) regresses in either direction.
"""

import numpy as np
import pytest

import concrete_tpu.jax_config  # noqa: F401

from concrete_tpu import params as pp
from concrete_tpu.core import keygen as kg
from concrete_tpu.core import kernels as K
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY as P

BITS = 3
BATCH = 4096


def _binomial_bounds(n: int, p: float, sigmas: float = 5.0):
    mean = n * p
    sd = np.sqrt(n * p * (1.0 - p))
    return max(mean - sigmas * sd, 0.0), mean + sigmas * sd


def test_pbs_failure_rate_matches_model(rng):
    """Encrypt at the atomic-pattern input noise (fresh BR output), run one
    batched PBS, and check failures against the modeled p_error."""
    sk, server = kg.keygen(rng, P)
    ksk = K.pack_ksk(server.ksk, P)
    bsk = K.pack_bsk(server.bsk, P)
    lut = np.arange(1 << BITS, dtype=np.uint64)
    lut_poly = ref.encode_expand_lut(lut, P.polynomial_size, BITS)

    # choose the input noise so the modeled decision-point failure rate is
    # ~1% — large enough for tight binomial statistics at this batch, small
    # enough that failures stay single-step events
    v_ks = pp.variance_keyswitch(P.n_big, P.ks_base_log, P.ks_level,
                                 P.lwe_std ** 2)
    v_ms = pp.variance_modulus_switch(P.n_small, P.log2_polynomial_size)
    margin = 2.0 ** (-(BITS + 2))
    # std such that 2*Q(margin/std) = 1%: margin/std = 2.576 (two-sided)
    v_target = (margin / 2.576) ** 2
    v_fresh = v_target - v_ks - v_ms
    assert v_fresh > 0
    msgs = rng.integers(0, 1 << BITS, BATCH)
    ct = kg.encrypt_lwe_batch(rng, sk.lwe_big, ref.encode(msgs, BITS),
                              np.sqrt(v_fresh))
    out = np.asarray(K.pbs_batch(ct, ksk, bsk, lut_poly, P, BITS))
    got = ref.decode(ref.lwe_decrypt(sk.lwe_big, out), BITS)
    failures = int((got != msgs).sum())

    predicted = pp.p_error_from_variance(v_target, BITS)
    lo, hi = _binomial_bounds(BATCH, predicted)
    assert predicted * BATCH > 5, (
        "test needs parameters with an observable failure rate; "
        f"predicted {predicted:.2e} x {BATCH} is too small to check")
    assert lo <= failures <= hi, (
        f"observed {failures} failures vs predicted "
        f"{predicted * BATCH:.1f} (5-sigma bounds [{lo:.1f}, {hi:.1f}]) — "
        "the noise model or a kernel regressed")


def test_simulation_failure_rate_matches_model():
    """The noise-accurate simulator must reproduce the same failure rate
    (it is the reference sim_* analog used for fast sweeps)."""
    import concrete_tpu as fhe

    cfg = fhe.Configuration(forced_parameters=P)
    table = fhe.LookupTable(list(range(1 << BITS)))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    circuit = f.compile([np.arange(1 << BITS)], cfg)
    rng = np.random.default_rng(11)
    msgs = rng.integers(0, 1 << BITS, BATCH)
    got = circuit.simulate(msgs)
    failures = int((np.asarray(got) != msgs).sum())
    # simulation decision variance = fresh-encrypt + ks + ms (no preceding
    # BR), so bound with that prediction
    var = (P.lwe_std ** 2
           + pp.variance_keyswitch(P.n_big, P.ks_base_log, P.ks_level,
                                   P.lwe_std ** 2)
           + pp.variance_modulus_switch(P.n_small, P.log2_polynomial_size))
    predicted = pp.p_error_from_variance(var, BITS)
    lo, hi = _binomial_bounds(BATCH, predicted)
    assert lo <= failures <= hi, (
        f"simulated {failures} failures vs predicted {predicted * BATCH:.1f} "
        f"(bounds [{lo:.1f}, {hi:.1f}])")


def test_global_p_error_union_bound():
    """Circuit.global_p_error must follow 1-(1-pe)^n over the PBS count."""
    import concrete_tpu as fhe

    cfg = fhe.Configuration(forced_parameters=P)
    table = fhe.LookupTable([0, 1, 2, 3, 4, 5, 6, 7])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[table[x]]

    circuit = f.compile(list(range(8)), cfg)
    pe = circuit.p_error
    n = circuit.programmable_bootstrap_count
    assert n == 2
    assert circuit.global_p_error == pytest.approx(1 - (1 - pe) ** n)
