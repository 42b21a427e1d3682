"""Example-workload tests (tiny insecure params; differential vs clear)."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.models import (GameOfLife, HammingDistance,
                                 LevenshteinDistance, PrimeMatch,
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


def test_prime_match():
    """Multi-output order matching: opposite sides on the same symbol fill
    at min(quantities); both result vectors decrypt correctly."""
    pm = PrimeMatch(n_bank=3, n_client=2, n_symbols=3, max_quantity=3)
    circuit = pm.compile(CFG)
    args = (np.array([0, 1, 0]), np.array([0, 1, 2]), np.array([3, 2, 1]),
            np.array([1, 0]), np.array([0, 1]), np.array([2, 3]))
    bank_want, client_want = pm.match_clear(*args)
    assert bank_want.tolist() == [2, 2, 0] and client_want.tolist() == [2, 2]
    for _ in range(4):
        bank_got, client_got = circuit.encrypt_run_decrypt(*args)
        if (np.array_equal(bank_got, bank_want)
                and np.array_equal(client_got, client_want)):
            break
    else:
        raise AssertionError((bank_got, client_got))


def test_sha1_simulation_matches_hashlib():
    """Full 80-round SHA1 through the module simulator (optimizer-chosen
    128-bit parameters, noise-accurate) equals hashlib on multi-chunk
    messages."""
    import hashlib

    from concrete_tpu.models import Sha1

    sha = Sha1()
    # one flipped TLU breaks the whole hash, and a digest runs ~10k TLUs:
    # at the default p_error (6.3e-5) a failure per digest is *expected*.
    # Budget the error circuit-wide instead so the test is deterministic
    # in practice (expected failures per digest ~1e-4).
    sha.compile(fhe.Configuration(p_error=1e-8))
    for message in (b"abc", b"x" * 77):  # 77 bytes forces two chunks
        assert sha.hexdigest(message) == hashlib.sha1(message).hexdigest()


def test_sha1_encrypted_primitives():
    """The module's adder composes across functions under encryption:
    encrypt via one function's input encoding, run another, decrypt."""
    from concrete_tpu.models import Sha1
    from concrete_tpu.models.sha1 import split32, unsplit32

    sha = Sha1()
    m = sha.compile(CFG)
    x, y = 0xDEADBEEF, 0x12345678
    want = (x + y) % 2**32
    for _ in range(4):
        ex = m.rotate30.encrypt(split32(x))
        ey = m.rotate30.encrypt(split32(y))
        got = unsplit32(np.asarray(m.add2.decrypt(m.add2.run(ex, ey))))
        if got == want:
            return
    raise AssertionError((hex(got), hex(want)))
