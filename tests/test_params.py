"""Noise-model / parameter tests.

The key check: our noise model (params.py) reproduces the p_error column of
the reference optimizer's golden V0 table (v0-parameters/ref/v0_last_128) for
its own parameter choices.  Table rows are copied here as data (parameter
values + expected p_error), giving a reference-anchored oracle for the noise
formulas without needing the Rust optimizer.
"""

import math

import pytest

from concrete_tpu import params as pp

# (precision) -> (n, k, N, br_l, br_b, ks_l, ks_b, reference p_error)
# from v0-parameters/ref/v0_last_128, norm2 = 2^0 rows.
V0_TABLE_128_NORM0 = {
    1: (592, 5, 256, 1, 15, 3, 3, 5.6e-5),
    2: (700, 5, 256, 1, 15, 3, 4, 6.3e-5),
    3: (722, 3, 512, 1, 18, 3, 4, 6.2e-5),
    4: (801, 2, 1024, 1, 23, 3, 4, 6.3e-5),
    5: (783, 1, 2048, 1, 23, 5, 3, 6.1e-5),
    6: (880, 1, 4096, 1, 22, 4, 4, 5.7e-5),
    8: (1006, 1, 16384, 2, 15, 5, 4, 6.1e-5),
}

# norm2 = 2^6 rows (precision -> row), checking the norm2 scaling of BR noise.
V0_TABLE_128_NORM6 = {
    1: (628, 5, 256, 2, 10, 3, 3, 6.3e-5),
    4: (759, 2, 1024, 1, 23, 5, 3, 6.0e-5),
}


@pytest.mark.parametrize("precision", sorted(V0_TABLE_128_NORM0))
def test_noise_model_matches_reference_table_norm0(precision):
    # with fft_precision=53 (the reference's f64-FFT noise term) our model
    # reproduces the golden table's p_error to 2 significant figures
    n, k, N, brl, brb, ksl, ksb, pe_ref = V0_TABLE_128_NORM0[precision]
    cp = pp.CryptoParams.make(n, k, N, brl, brb, ksl, ksb)
    pe = cp.p_error(precision, fft_precision=53)
    assert pe == pytest.approx(pe_ref, rel=0.05), (pe, pe_ref)
    # our exact-arithmetic path is never noisier than the reference path
    assert cp.p_error(precision) <= pe


@pytest.mark.parametrize("precision", sorted(V0_TABLE_128_NORM6))
def test_noise_model_matches_reference_table_norm6(precision):
    n, k, N, brl, brb, ksl, ksb, pe_ref = V0_TABLE_128_NORM6[precision]
    cp = pp.CryptoParams.make(n, k, N, brl, brb, ksl, ksb)
    pe = cp.p_error(precision, norm2=2 ** 6, fft_precision=53)
    assert pe == pytest.approx(pe_ref, rel=0.05), (pe, pe_ref)


def test_security_curve_values():
    # reference security.rs unit test: secure_log2_std(512, 64) in (-12, -10)
    assert -12.0 < pp.secure_log2_std(512) < -10.0
    # below minimal dimension -> full-modulus std (insecure marker)
    assert pp.secure_log2_std(100) == 64.0


def test_bench_params_are_valid():
    assert pp.BENCH_PARAMS_4BIT.p_error(4) < 1e-4
    assert pp.BENCH_PARAMS_6BIT.p_error(6) < 1e-4
    assert pp.BENCH_PARAMS_4BIT.n_big == 2048


def test_p_error_monotonic_in_precision():
    cp = pp.BENCH_PARAMS_4BIT
    assert cp.p_error(3) < cp.p_error(4) < cp.p_error(5)


def test_fft_noise_term_positive():
    # the reference f64-FFT path adds noise; our exact path doesn't
    v_exact = pp.variance_external_product(2, 1024, 23, 1, 2.0 ** -100)
    v_fft = pp.variance_external_product(2, 1024, 23, 1, 2.0 ** -100,
                                         fft_precision=53)
    assert v_fft > v_exact


def test_variance_keyswitch_properties():
    # linear in input dimension; decreasing in level
    v1 = pp.variance_keyswitch(1024, 4, 3, 2.0 ** -33)
    v2 = pp.variance_keyswitch(2048, 4, 3, 2.0 ** -33)
    assert v2 == pytest.approx(2 * v1)
    v_more_levels = pp.variance_keyswitch(1024, 4, 5, 2.0 ** -33)
    assert v_more_levels < v1 * 2  # rounding term shrinks with levels


def test_truncation_budget_scales_with_norm2():
    """High-norm2 circuits must truncate less (the truncation error is
    amplified by norm2^2 downstream of the blind rotate)."""
    from concrete_tpu.params import BENCH_PARAMS_4BIT_TPUOPT, choose_truncate_limbs
    t1 = choose_truncate_limbs(BENCH_PARAMS_4BIT_TPUOPT, 4, norm2=1)
    t_hi = choose_truncate_limbs(BENCH_PARAMS_4BIT_TPUOPT, 4, norm2=1 << 20)
    assert t_hi < t1
