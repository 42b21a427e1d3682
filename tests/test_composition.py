"""Composition, multi-output, and signed-tensor coverage.

Reference analogs: tests/execution/test_compilation.py composition tests and
the AllComposable policy (module output ciphertexts feed other functions'
inputs without re-encryption), multi-output circuits, and the signed TLU
sweeps of tests/execution/test_others.py.
"""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY, TEST_PARAMS_TINY_WIDE


def _retry(fn, want, attempts=4):
    """Absorb the tiny-params per-PBS p_error statistically (reference
    conftest.py:260 check_execution retry loop)."""
    for _ in range(attempts):
        got = fn()
        if np.all(np.asarray(got) == np.asarray(want)):
            return got
    raise AssertionError(f"got {got}, want {want} after {attempts} tries")


def test_module_composition_chain():
    """Run f, feed its output ciphertext straight into g (no re-encrypt)."""

    @fhe.module()
    class Counter:
        @fhe.function({"x": "encrypted"})
        def double(x):
            return fhe.LookupTable([(2 * v) % 8 for v in range(8)])[x]

        @fhe.function({"x": "encrypted"})
        def increment(x):
            return fhe.LookupTable([(v + 1) % 8 for v in range(8)])[x]

    module = Counter.compile(
        {"double": list(range(8)), "increment": list(range(8))},
        forced_parameters=TEST_PARAMS_TINY)
    module.keygen(seed=3)

    def chain():
        enc = module.double.encrypt(3)
        mid = module.double.run(enc)          # 6
        out = module.increment.run(mid)       # composition: ct -> ct
        return module.increment.decrypt(out)

    _retry(chain, (2 * 3 + 1) % 8)


def test_module_composition_loop():
    """Iterated composition: run the same function on its own output."""

    @fhe.module()
    class Inc:
        @fhe.function({"x": "encrypted"})
        def inc(x):
            return fhe.LookupTable([(v + 1) % 8 for v in range(8)])[x]

    module = Inc.compile({"inc": list(range(8))},
                         forced_parameters=TEST_PARAMS_TINY)
    module.keygen(seed=5)

    def loop():
        ct = module.inc.encrypt(0)
        for _ in range(5):
            ct = module.inc.run(ct)
        return module.inc.decrypt(ct)

    _retry(loop, 5)


def test_multi_output_circuit():
    table = fhe.LookupTable([v // 2 for v in range(8)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1, table[x]

    circuit = f.compile(list(range(7)), forced_parameters=TEST_PARAMS_TINY)
    circuit.keygen(seed=9)

    def run():
        return circuit.encrypt_run_decrypt(5)

    got = _retry(lambda: run(), (6, 2))
    assert isinstance(got, tuple) and len(got) == 2


def test_signed_tensor_tlu_sweep():
    """Signed tensor through a TLU: negative indexing semantics over the
    full domain (reference extensions/table.py signed index convention)."""
    table = fhe.LookupTable([v * v for v in range(-4, 4)])  # index -4..3

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    domain = np.arange(-4, 4)
    circuit = f.compile([domain, -domain - 1],
                        forced_parameters=TEST_PARAMS_TINY_WIDE)
    circuit.keygen(seed=2)
    # LookupTable with signed index: table[v] = (v*v list)[v] with negative
    # python indexing — -4 -> (-4)^2 ... matching plaintext evaluation
    want = np.asarray([table.table[v] for v in domain])
    _retry(lambda: circuit.encrypt_run_decrypt(domain), want)


def test_signed_output_roundtrip():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x - 3

    circuit = f.compile(list(range(6)), forced_parameters=TEST_PARAMS_TINY)
    circuit.keygen(seed=4)
    _retry(lambda: circuit.encrypt_run_decrypt(0), -3)
    _retry(lambda: circuit.encrypt_run_decrypt(5), 2)


def test_module_wide_tlu_compiles_and_runs():
    """Modules support >8-bit TLUs: the pooled optimizer picks WoP gadgets
    and run ships the packing keyswitch key (regression: the module path
    used the legacy single-pattern optimizer and raised at compile)."""
    wide_table = fhe.LookupTable([(3 * i + 1) % 8 for i in range(1 << 9)])

    @fhe.module()
    class Wide:
        @fhe.function({"x": "encrypted"})
        def lut(x):
            return wide_table[x]

    from concrete_tpu.params import TEST_PARAMS_TINY_WIDE
    mod = Wide.compile(
        {"lut": [0, 200, 511]},
        fhe.Configuration(forced_parameters=TEST_PARAMS_TINY_WIDE,
                          forced_wop_parameters=(3, 6, 8, 4)))
    for _ in range(6):
        got = mod.lut.encrypt_run_decrypt(200)
        if int(got) == (3 * 200 + 1) % 8:
            return
    raise AssertionError(got)


def test_module_composition_requires_refreshed_outputs():
    """A composable output carrying leveled amplification would compound
    noise without bound when re-fed; compile must reject it with guidance
    (reference composition rules require refreshed outputs)."""
    @fhe.module()
    class Amplifying:
        @fhe.function({"x": "encrypted"})
        def double(x):
            return x + x

    with pytest.raises(ValueError, match="refresh|Composable"):
        Amplifying.compile(
            {"double": list(range(4))},
            fhe.Configuration(forced_parameters=TEST_PARAMS_TINY))


def test_module_empty_inputset_clear_error():
    @fhe.module()
    class M:
        @fhe.function({"x": "encrypted"})
        def f(x):
            return x + 1

    with pytest.raises(ValueError, match="must not be empty"):
        M.compile({"f": []},
                  fhe.Configuration(forced_parameters=TEST_PARAMS_TINY))
