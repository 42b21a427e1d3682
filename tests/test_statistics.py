"""Circuit statistics: the ExtractStatistics-analog `*_count*` grid.

Reference: compiler/lib/Dialect/TFHE/Analysis/ExtractStatistics.cpp and
circuit.py:302-533 (28 count properties + `statistics` dict).
"""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def test_scalar_op_counts():
    table = fhe.LookupTable([0, 1, 4, 2])

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        with fhe.tag("lut"):
            t = table[x]
        return t + y - 1

    c = f.compile([(i, j) for i in range(4) for j in range(4)], CFG)
    assert c.programmable_bootstrap_count == 1
    assert c.key_switch_count == 1
    assert c.encrypted_addition_count == 1    # t + y
    assert c.clear_addition_count == 1        # - 1
    assert c.encrypted_negation_count == 0
    assert c.programmable_bootstrap_count_per_tag == {"lut": 1}
    assert list(c.programmable_bootstrap_count_per_parameter.values()) == [1]


def test_negation_and_clear_sub():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return 7 - x

    c = f.compile(range(4), CFG)
    assert c.encrypted_negation_count == 1
    assert c.clear_addition_count == 1


def test_matmul_mac_counts():
    w = np.array([[1, 2], [3, 1], [0, 1]])

    @fhe.compiler({"x": "encrypted"})
    def g(x):
        return x @ w

    c = g.compile([np.random.randint(0, 3, (3,)) for _ in range(8)], CFG)
    # out size 2, contraction length 3: 6 clear mults, 2*(3-1) enc adds
    assert c.clear_multiplication_count == 6
    assert c.encrypted_addition_count == 4
    assert c.programmable_bootstrap_count == 0


def test_tensor_tlu_counts_per_element():
    table = fhe.LookupTable(list(range(4)))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    c = f.compile([np.random.randint(0, 4, (5,)) for _ in range(8)], CFG)
    assert c.programmable_bootstrap_count == 5
    assert c.key_switch_count == 5


def test_sum_counts():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return np.sum(x)

    c = f.compile([np.random.randint(0, 2, (6,)) for _ in range(8)], CFG)
    assert c.encrypted_addition_count == 5    # 6 -> 1


def test_statistics_dict_complete():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    c = f.compile(range(4), CFG)
    s = c.statistics
    from concrete_tpu.compilation import statistics as st
    for kind in st.KINDS:
        for suffix in ("_count", "_count_per_parameter", "_count_per_tag",
                       "_count_per_tag_per_parameter"):
            assert f"{kind}{suffix}" in s
    for extra in ("size_of_secret_keys", "size_of_bootstrap_keys",
                  "p_error", "global_p_error", "complexity"):
        assert extra in s


def test_extract_bits_cascade_counts():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[1]

    c = f.compile(range(8), CFG)
    # lsb cascade peels bits 0..1: one KS+PBS per step
    assert c.programmable_bootstrap_count == 2
    assert c.key_switch_count == 2


def test_per_tag_per_parameter_shape():
    table = fhe.LookupTable(list(range(4)))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        with fhe.tag("a"):
            t = table[x]
        with fhe.tag("b"):
            return table[t]

    c = f.compile(range(4), CFG)
    grid = c.programmable_bootstrap_count_per_tag_per_parameter
    assert set(grid) == {"a", "b"}
    assert all(sum(v.values()) == 1 for v in grid.values())
