"""Radix big-integer arithmetic tests (8-bit values, 2-bit limbs)."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.extensions import bigint as bi
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
W = 2       # limb bits
NL = 3      # limbs -> 6-bit integers


def _compile_binop(op):
    @fhe.compiler({"a": "encrypted", "b": "encrypted"})
    def f(a, b):
        a_l = [a[i] for i in range(NL)]
        b_l = [b[i] for i in range(NL)]
        return op(a_l, b_l, W)

    rng = np.random.default_rng(0)
    inputset = [(rng.integers(0, 4, (NL,)), rng.integers(0, 4, (NL,)))
                for _ in range(30)]
    return f.compile(inputset, CFG)


def _enc(v):
    return np.array(bi.radix_decompose_clear(v, W, NL))


def _run(circuit, x, y):
    return circuit.encrypt_run_decrypt(_enc(x), _enc(y))


def test_radix_add():
    circuit = _compile_binop(bi.radix_add)
    mod = 1 << (W * NL)
    for x, y in ((5, 7), (33, 42), (63, 63)):
        for _ in range(4):
            got = _run(circuit, x, y)
            if bi.radix_recompose_clear(got, W) == (x + y) % mod:
                break
        else:
            raise AssertionError((x, y, got))


def test_radix_mul():
    circuit = _compile_binop(bi.radix_mul)
    mod = 1 << (W * NL)
    for x, y in ((5, 7), (9, 6)):
        for _ in range(5):
            got = _run(circuit, x, y)
            if bi.radix_recompose_clear(got, W) == (x * y) % mod:
                break
        else:
            raise AssertionError((x, y, got))


def test_radix_compare():
    circ_lt = _compile_binop(bi.radix_lt)
    circ_eq = _compile_binop(bi.radix_eq)
    for x, y in ((5, 7), (7, 5), (33, 33)):
        for _ in range(4):
            got = circ_lt.encrypt_run_decrypt(_enc(x), _enc(y))
            if int(got) == int(x < y):
                break
        else:
            raise AssertionError(("lt", x, y, got))
        for _ in range(4):
            got = circ_eq.encrypt_run_decrypt(_enc(x), _enc(y))
            if int(got) == int(x == y):
                break
        else:
            raise AssertionError(("eq", x, y, got))
