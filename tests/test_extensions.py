"""Extension tests (rounding, bits, mux/relu, conv/maxpool, tag/hint)."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def check(circuit, function, *sample, retries=3):
    for attempt in range(retries):
        got = circuit.encrypt_run_decrypt(*sample)
        want = function(*[np.asarray(s) for s in sample])
        if np.array_equal(np.asarray(got), np.asarray(want)):
            return
        if attempt == retries - 1:
            raise AssertionError(f"{got} != {want} for {sample}")


def test_round_bit_pattern():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.round_bit_pattern(x, lsbs_to_remove=2)

    circuit = f.compile(range(16), CFG)
    check(circuit, lambda x: ((x + 2) // 4) * 4, 5)
    check(circuit, lambda x: ((x + 2) // 4) * 4, 11)


def test_truncate_bit_pattern():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.truncate_bit_pattern(x, lsbs_to_remove=2)

    circuit = f.compile(range(16), CFG)
    check(circuit, lambda x: (x // 4) * 4, 7)


def test_auto_rounder():
    rounder = fhe.AutoRounder(target_msbs=2)
    for v in range(16):
        rounder.adjust(v)
    assert rounder.lsbs_to_remove == 2


def test_bits_extraction():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[0] + 2 * fhe.bits(x)[2]

    circuit = f.compile(range(8), CFG)
    check(circuit, lambda x: (x & 1) + 2 * ((x >> 2) & 1), 5)


def test_mux():
    @fhe.compiler({"c": "encrypted", "a": "encrypted", "b": "encrypted"})
    def f(c, a, b):
        return fhe.if_then_else(c, a, b)

    inputset = [(c, a, b) for c in range(2) for a in range(3)
                for b in range(3)]
    circuit = f.compile(inputset, CFG)
    check(circuit, lambda c, a, b: a if c else b, 1, 2, 0)
    check(circuit, lambda c, a, b: a if c else b, 0, 2, 1)


def test_relu():
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return fhe.relu(x - y)

    inputset = [(i, j) for i in range(4) for j in range(4)]
    circuit = f.compile(inputset, CFG)
    check(circuit, lambda x, y: max(x - y, 0), 1, 3)
    check(circuit, lambda x, y: max(x - y, 0), 3, 1)


def test_conv2d():
    w = np.array([[[[1, 0], [0, 1]]]], dtype=np.int64)  # OIHW (1,1,2,2)

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.conv(x, w)

    inputset = [np.random.randint(0, 3, (1, 1, 3, 3)) for _ in range(10)]
    circuit = f.compile(inputset, CFG)
    sample = np.arange(9).reshape(1, 1, 3, 3) % 3

    def plain(x):
        out = np.zeros((1, 1, 2, 2), dtype=np.int64)
        for yy in range(2):
            for xx in range(2):
                out[0, 0, yy, xx] = (x[0, 0, yy:yy + 2, xx:xx + 2]
                                     * w[0, 0]).sum()
        return out

    check(circuit, plain, sample)


def test_maxpool():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.maxpool(x, kernel_shape=(2, 2))

    inputset = [np.random.randint(0, 4, (1, 1, 2, 2)) for _ in range(10)]
    circuit = f.compile(inputset, CFG)
    sample = np.array([[[[1, 3], [2, 0]]]])
    check(circuit, lambda x: x.max(axis=(2, 3), keepdims=True), sample)


def test_tag_and_hint():
    with fhe.tag("layer1"):
        from concrete_tpu.extensions.tag import current_tag
        assert current_tag() == "layer1"

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.hint(x + 1, bit_width=5)

    circuit = f.compile(range(4), CFG)
    # hint forces at least 5 bits of headroom
    assert circuit.client_specs.message_bits >= 5
    check(circuit, lambda x: x + 1, 2)


def test_crt_arithmetic():
    from concrete_tpu.extensions import crt

    moduli = (3, 4, 5)  # covers 0..59

    @fhe.compiler({"a": "encrypted", "b": "encrypted"})
    def f(a, b):
        a_r = [a[i] for i in range(3)]
        b_r = [b[i] for i in range(3)]
        return crt.crt_add(a_r, b_r, moduli)

    rng = np.random.default_rng(0)
    inputset = [(np.array(crt.crt_encode_clear(rng.integers(0, 30), moduli)),
                 np.array(crt.crt_encode_clear(rng.integers(0, 30), moduli)))
                for _ in range(20)]
    circuit = f.compile(inputset, CFG)
    for x, y in ((25, 17), (3, 9)):
        xa = np.array(crt.crt_encode_clear(x, moduli))
        yb = np.array(crt.crt_encode_clear(y, moduli))
        for _ in range(4):
            got = circuit.encrypt_run_decrypt(xa, yb)
            if crt.crt_decode_clear(got, moduli) == (x + y) % 60:
                break
        else:
            raise AssertionError((x, y, got))


def test_run_async():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    circuit = f.compile(range(6), CFG)
    circuit.keygen()
    enc = circuit.encrypt(3)
    fut = circuit.run_async(enc)
    out = fut.result(timeout=120)
    assert circuit.decrypt(out) == 4
