"""Example-workload tests (tiny insecure params; differential vs clear)."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.models import (GameOfLife, HammingDistance,
                                 LevenshteinDistance,
                                 PrivateInformationRetrieval,
                                 QuantizedMLP, StaticKeyValueDatabase)
from concrete_tpu.params import TEST_PARAMS_TINY_WIDE

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY_WIDE)


def test_quantized_mlp():
    mlp = QuantizedMLP(d_in=6, d_hidden=3, d_out=2, weight_bits=2,
                       activation_bits=2)
    circuit = mlp.compile(CFG)
    x = np.array([1, 0, 3, 2, 1, 0])
    for _ in range(3):
        got = circuit.encrypt_run_decrypt(x)
        if np.array_equal(np.asarray(got), mlp.infer_clear(x)):
            return
    raise AssertionError(f"{got} != {mlp.infer_clear(x)}")


def test_game_of_life_step():
    gol = GameOfLife(3, 3)
    circuit = gol.compile(CFG)
    grid = np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]])  # blinker
    want = gol.step_clear(grid)
    for _ in range(3):
        got = np.array(circuit.encrypt_run_decrypt(grid)).reshape(3, 3)
        if np.array_equal(got, want):
            return
    raise AssertionError(f"{got} != {want}")


def test_levenshtein_distance():
    lev = LevenshteinDistance(2, 2, alphabet_bits=1)
    circuit = lev.compile(CFG)
    a = np.array([0, 1])
    b = np.array([1, 1])
    want = LevenshteinDistance.distance_clear(list(a), list(b))
    for _ in range(4):
        got = circuit.encrypt_run_decrypt(a, b)
        if int(got) == want:
            return
    raise AssertionError(f"{got} != {want}")


def test_static_kvdb():
    db = StaticKeyValueDatabase([1, 3, 5], [10, 4, 7])
    circuit = db.compile(CFG)
    for key in (3, 5, 2):
        for _ in range(3):
            got = circuit.encrypt_run_decrypt(key)
            if int(got) == db.query_clear(key):
                break
        else:
            raise AssertionError((key, got))


@pytest.mark.parametrize("via", ["packed", "xor"])
def test_hamming_distance(via):
    hd = HammingDistance(n_words=4, word_bits=2)
    circuit = hd.compile(CFG, via=via)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 4, 4)
    y = rng.integers(0, 4, 4)
    want = hd.distance_clear(x, y)
    for _ in range(4):
        got = circuit.encrypt_run_decrypt(x, y)
        if int(got) == want:
            return
    raise AssertionError(f"{got} != {want}")


def test_pir_row_fetch():
    db = np.array([[1, 2, 0], [3, 0, 1], [0, 1, 2], [2, 3, 3]])
    pir = PrivateInformationRetrieval(db)
    circuit = pir.compile(CFG)
    for idx in (0, 3):
        want = pir.query_clear(idx)
        for _ in range(4):
            got = np.asarray(circuit.encrypt_run_decrypt(idx))
            if np.array_equal(got, want):
                break
        else:
            raise AssertionError((idx, got, want))
