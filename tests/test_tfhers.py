"""TFHE-rs interop tests: radix types, to/from native, raw-LWE bridge."""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu import tfhers
from concrete_tpu.core import keygen as kg
from concrete_tpu.core import refimpl as ref
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def test_radix_encode_decode():
    t = tfhers.uint8_2_2()
    assert t.n_blocks == 4
    for v in (0, 1, 137, 255):
        blocks = t.encode_blocks(v)
        assert all(0 <= b < 4 for b in blocks)
        assert t.decode_blocks(blocks) == v
    s = tfhers.int8_2_2()
    assert s.decode_blocks(s.encode_blocks(-3)) == -3


def test_to_native_circuit():
    t = tfhers.TFHERSIntegerType(False, 4, 2, 2, tfhers.uint8_2_2().params)

    @fhe.compiler({"blocks": "encrypted"})
    def f(blocks):
        return tfhers.to_native(blocks, t)

    inputset = [np.array(t.encode_blocks(v)) for v in range(16)]
    circuit = f.compile(inputset, CFG)
    for v in (0, 5, 15):
        blocks = np.array(t.encode_blocks(v))
        for _ in range(3):
            got = circuit.encrypt_run_decrypt(blocks)
            if int(got) == v:
                break
        else:
            raise AssertionError((v, got))


def test_from_native_circuit():
    t = tfhers.TFHERSIntegerType(False, 4, 2, 2, tfhers.uint8_2_2().params)

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return tfhers.from_native(x, t)

    circuit = f.compile(range(16), CFG)
    for v in (3, 9, 14):
        for _ in range(3):
            got = circuit.encrypt_run_decrypt(v)
            if list(int(g) for g in got) == t.encode_blocks(v):
                break
        else:
            raise AssertionError((v, got))


def test_bridge_import_shared_key():
    """Blocks encrypted under a shared key with the TFHE-rs encoding import
    into the circuit and compute correctly."""
    t = tfhers.TFHERSIntegerType(False, 4, 2, 2, tfhers.uint8_2_2().params)

    @fhe.compiler({"blocks": "encrypted"})
    def f(blocks):
        return tfhers.to_native(blocks, t)

    inputset = [np.array(t.encode_blocks(v)) for v in range(16)]
    circuit = f.compile(inputset, CFG)
    circuit.keygen()
    bridge = tfhers.new_bridge(circuit, {0: t})

    # "tfhe-rs side": encrypt radix blocks under the shared big key with
    # delta = 2^(64 - msg - carry - 1)
    rng = np.random.default_rng(5)
    sk = circuit.keys.secret.lwe_big
    v = 11
    blocks = np.array(t.encode_blocks(v), dtype=np.uint64)
    delta = np.uint64(1) << np.uint64(t.delta_log2)
    for _ in range(4):  # retry absorbs the tiny-params p_error
        cts = kg.encrypt_lwe_batch(rng, sk, blocks * delta,
                                   TEST_PARAMS_TINY.lwe_std / 64)
        imported = bridge.import_value(cts, 0)
        out = circuit.run(imported)
        if int(circuit.decrypt(out)) == v:
            break
    else:
        raise AssertionError(circuit.decrypt(out))
    # secret key serialization round-trip
    raw = bridge.serialize_input_secret_key(0)
    assert np.array_equal(np.frombuffer(raw, dtype=np.uint64), sk)


def test_keygen_with_initial_keys_foreign_key():
    """The circuit's BSK/KSK are generated FROM a foreign shared key: blocks
    encrypted under the foreign key import, run a TLU (a real bootstrap
    under the shared key), and decrypt correctly."""
    t = tfhers.TFHERSIntegerType(False, 4, 2, 2, tfhers.uint8_2_2().params)
    table = fhe.LookupTable([(3 * v) % 16 for v in range(16)])

    @fhe.compiler({"blocks": "encrypted"})
    def f(blocks):
        return table[tfhers.to_native(blocks, t)]

    inputset = [np.array(t.encode_blocks(v)) for v in range(16)]
    circuit = f.compile(inputset, CFG)

    # the "tfhe-rs side" key is generated independently of the circuit
    foreign_rng = np.random.default_rng(123)
    foreign_key = ref.sample_binary_key(
        foreign_rng, (TEST_PARAMS_TINY.n_big,))

    bridge = tfhers.new_bridge(circuit, {0: t})
    bridge.keygen_with_initial_keys({0: foreign_key})
    # circuit's big key IS the foreign key now
    assert np.array_equal(circuit.keys.secret.lwe_big, foreign_key)

    v = 11
    blocks = np.array(t.encode_blocks(v), dtype=np.uint64)
    delta = np.uint64(1) << np.uint64(t.delta_log2)
    rng = np.random.default_rng(7)
    for _ in range(5):
        cts = kg.encrypt_lwe_batch(rng, foreign_key, blocks * delta,
                                   TEST_PARAMS_TINY.lwe_std / 64)
        imported = bridge.import_value(cts, 0)
        out = circuit.run(imported)
        if int(circuit.decrypt(out)) == (3 * v) % 16:
            break
    else:
        raise AssertionError(circuit.decrypt(out))

    # idempotent: same shared key does not regenerate
    bsk_before = circuit.keys.server.bsk.copy()
    bridge.keygen_with_initial_keys({0: foreign_key})
    assert np.array_equal(circuit.keys.server.bsk, bsk_before)
