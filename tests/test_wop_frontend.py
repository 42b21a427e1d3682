"""Frontend integration of WoP-PBS: >8-bit TLUs through compile/run.

Reference coverage analog: compiler end-to-end multi_precision / CRT TLU
tests (FHEToTFHECrt lowering) — here the wide-TLU path lowers to
extract-bits -> circuit-bootstrap -> vertical-packing on the batched JAX
kernels.
"""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY_WIDE

# validated gadgets for the tiny params (tests/test_wop_kernels.py)
WOP_GADGETS = (3, 6, 8, 4)   # (cbs_level, cbs_base_log, pfks_level, pfks_base)

CFG = dict(forced_parameters=TEST_PARAMS_TINY_WIDE,
           forced_wop_parameters=WOP_GADGETS)


def _retry(circuit, args, want, attempts=4):
    for _ in range(attempts):
        got = circuit.encrypt_run_decrypt(*args)
        if np.all(np.asarray(got) == np.asarray(want)):
            return got
    return got


def test_wide_tlu_10bit():
    table = fhe.LookupTable([(3 * i + 1) % 32 for i in range(1 << 10)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    c = f.compile([0, 517, 1023], fhe.Configuration(**CFG))
    assert c.client_specs.wop_gadgets == WOP_GADGETS
    for m in (0, 517, 1023):
        got = _retry(c, (m,), (3 * m + 1) % 32)
        assert got == (3 * m + 1) % 32, (m, got)


def test_wide_tlu_tensor_and_mixed_precision():
    """A circuit mixing a 10-bit WoP TLU and a 3-bit native TLU."""
    wide = fhe.LookupTable([i % 8 for i in range(1 << 10)])
    narrow = fhe.LookupTable([i * i % 8 for i in range(8)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return narrow[wide[x]]

    c = f.compile([np.array([0, 1000]), np.array([517, 3])],
                  fhe.Configuration(**CFG))
    x = np.array([9, 1001])
    want = (x % 8) ** 2 % 8
    got = _retry(c, (x,), want)
    np.testing.assert_array_equal(got, want)
    # the native TLU must NOT be in the wop specs
    assert len(c.server._executor.wop_specs) == 1
    assert len(c.server._executor.tlu_specs) == 1


def test_wide_tlu_signed_9bit():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.univariate(lambda v: abs(v) % 16)(x)

    c = f.compile([-256, -1, 0, 255], fhe.Configuration(**CFG))
    for m in (-256, -37, 0, 200):
        got = _retry(c, (m,), abs(m) % 16)
        assert got == abs(m) % 16, (m, got)


def test_wop_serialization_roundtrip(tmp_path):
    """Server archive + key (de)serialization keep the WoP machinery."""
    from concrete_tpu.compilation.server import Server
    table = fhe.LookupTable([(i // 2) % 16 for i in range(1 << 9)])

    @fhe.compiler({"x": "encrypted"})
    def g(x):
        return table[x]

    c = g.compile([0, 511], fhe.Configuration(**CFG))
    path = str(tmp_path / "wop_server.zip")
    c.server.save(path)
    loaded = Server.load(path)
    assert loaded.client_specs.wop_gadgets == WOP_GADGETS
    assert len(loaded._executor.wop_specs) == 1

    # keys: generate + wop keys, round-trip through npz
    c.keygen()
    wp = c.client_specs.wop_params()
    c.keys.wop_evaluation(wp)
    blob = c.keys.serialize()
    from concrete_tpu.compilation.keys import Keys
    k2 = Keys.deserialize(blob)
    key = (wp.pfks_level, wp.pfks_base_log)
    np.testing.assert_array_equal(k2._pfpksk[key], c.keys._pfpksk[key])


def test_wop_optimizer_path():
    """Without forced parameters the optimizer must produce a consistent
    (base params, gadget) solution for a 12-bit TLU."""
    from concrete_tpu.optimizer.v0 import choose_wop_gadgets, optimize_v0_multi
    from concrete_tpu import params as pp
    from concrete_tpu.optimizer.v0 import safe_variance_bound
    params = optimize_v0_multi(((6, 2),), noise_only=((12, 1),),
                               wop_patterns=((12, 6, 2),))
    wp = choose_wop_gadgets(params, 12, ((6, 2),))
    v_out = pp.wop_output_variance(params, 12, wp.cbs_base_log, wp.cbs_level,
                                   wp.pfks_base_log, wp.pfks_level)
    v_ks = pp.variance_keyswitch(params.n_big, params.ks_base_log,
                                 params.ks_level, params.lwe_std ** 2)
    v_ms = pp.variance_modulus_switch(params.n_small,
                                      params.log2_polynomial_size)
    assert v_out * 4 + v_ks + v_ms < safe_variance_bound(6, 6.3e-5)
    # security floor holds
    assert params.security_level == 128


def test_wop_fused_truncate_correctness():
    """truncate_bit_pattern fused into a WIDE TLU: WoP bit extraction
    floors for free, so the spec must be sized at the reduced width and
    carry no half-step bias (review finding: nb was built at full width
    and the native-path bias corrupted the lookup)."""
    table = fhe.LookupTable([(3 * v + 1) % 16 for v in range(1 << 12)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[fhe.truncate_bit_pattern(x, lsbs_to_remove=2)]

    inputset = [0, 1111, 2502, (1 << 12) - 1]
    c = f.compile(inputset, fhe.Configuration(**CFG))
    spec = next(iter(c.server._executor.wop_specs.values()))
    assert spec.nb_bits == 10, spec.nb_bits   # 12 - 2 fused lsbs
    for x in (0, 1111, 2502, 4095):
        want = (3 * ((x >> 2) << 2) + 1) % 16
        got = _retry(c, (x,), want)
        assert got == want, (x, got, want)


def test_wop_fused_round_correctness():
    """round_bit_pattern fused into a wide TLU: the WoP path needs the
    +half bias so its flooring extraction rounds to nearest."""
    table = fhe.LookupTable([(v + 5) % 16 for v in range(1 << 12)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[fhe.round_bit_pattern(x, lsbs_to_remove=2)]

    inputset = [0, 1113, 2503, (1 << 12) - 5]
    c = f.compile(inputset, fhe.Configuration(**CFG))
    for x in (0, 1113, 2503):
        r = ((x + 2) >> 2) << 2          # round to multiple of 4
        want = (r + 5) % 16
        got = _retry(c, (x,), want)
        assert got == want, (x, got, want)


def test_wide_output_compiles():
    """A wide encrypted output (no further TLU) must not impose the
    N >= 2^(p+1) mega-case requirement (review finding: compilation of
    13-bit outputs failed infeasibly)."""
    table = fhe.LookupTable(list(range(1 << 6)))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[fhe.truncate_bit_pattern(x, lsbs_to_remove=7) >> 7] * 3

    inputset = [int(v) for v in
                np.random.default_rng(1).integers(0, 1 << 13, 40)] \
        + [0, (1 << 13) - 1]
    circuit = f.compile(inputset)     # must not raise
    assert circuit.graph(1 << 12) == ((1 << 12) >> 7) * 3


def test_wide_multi_table():
    """Per-element (multi-dimensional) LookupTables on a >8-bit input:
    each element bootstraps through WoP with its own table row
    (regression: the WoP materialization indexed table ROWS by value)."""
    tables = fhe.LookupTable(np.stack([
        [(3 * i + 1) % 16 for i in range(1 << 10)],
        [(i // 2) % 16 for i in range(1 << 10)],
    ]))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return tables[x]

    samples = [np.array([0, 1023]), np.array([517, 2]),
               np.array([800, 31])]
    c = f.compile(samples, fhe.Configuration(**CFG))
    x = np.array([517, 40])
    want = np.array([(3 * 517 + 1) % 16, (40 // 2) % 16])
    got = _retry(c, (x,), want)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_clear_output_tlu_not_materialized():
    """A clear-output univariate must not be materialized as a PBS spec at
    compile time (regression: the executor required WoP gadgets for it and
    evaluated the user function over the full wide domain).  Executing a
    clear TLU over a runtime clear input is explicitly unsupported; the
    compile itself and the spec skip are the contract."""
    def partial_fn(v):
        assert v < 4, "evaluated outside the observed clear domain"
        return int(v) + 1

    wide = fhe.LookupTable([i % 8 for i in range(1 << 10)])

    @fhe.compiler({"x": "encrypted", "c": "clear"})
    def g(x, c):
        return wide[x] + fhe.univariate(partial_fn)(c)

    # compiles without WoP-gadget demands for the clear univariate and
    # without evaluating partial_fn over 2^10 values
    c2 = g.compile([(0, 1), (1023, 3), (517, 2)],
                   fhe.Configuration(**CFG))
    clear_nodes = [n for n in c2.graph.topological_order()
                   if n.name == "univariate"
                   and not n.output.is_encrypted]
    assert clear_nodes, "expected a clear univariate node"
    ex = c2.server._executor
    assert all(n.uid not in ex.tlu_specs and n.uid not in ex.wop_specs
               for n in clear_nodes)
    # the run-path contract: a clear TLU over a runtime clear input is an
    # explicit NotImplementedError, not garbage
    with pytest.raises(NotImplementedError, match="clear"):
        c2.encrypt_run_decrypt(517, 2)
