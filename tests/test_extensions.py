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
        circuit.keygen(force=True)  # noise failures are key-conditioned


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


def test_bits_slice():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[1:4]

    circuit = f.compile(range(16), CFG)
    check(circuit, lambda x: (x >> 1) & 0b111, 13)
    check(circuit, lambda x: (x >> 1) & 0b111, 6)


def test_bits_tensor():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[1]

    circuit = f.compile([np.array([0, 7]), np.array([5, 2])], CFG)
    check(circuit, lambda x: (x >> 1) & 1, np.array([3, 6]))


def test_bits_signed():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[0] + 2 * fhe.bits(x)[1]

    circuit = f.compile(range(-4, 4), CFG)
    check(circuit, lambda x: (x & 1) + 2 * ((x >> 1) & 1), -3)
    check(circuit, lambda x: (x & 1) + 2 * ((x >> 1) & 1), 2)


def test_bits_simulation():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[0:3]

    circuit = f.compile(range(8), CFG)
    assert circuit.simulate(5) == 5
    assert circuit.simulate(6) == 6


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


# -- fused rounding (ProcessRounding) ----------------------------------------

def test_round_fused_into_consumer_tlu():
    """round_bit_pattern feeding a TLU costs NO extra PBS: the consumer PBS
    runs at the reduced width (modulus-switch rounding)."""
    table = fhe.LookupTable([(v // 4) % 4 for v in range(16)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[fhe.round_bit_pattern(x, lsbs_to_remove=2)]

    circuit = f.compile(range(16), CFG)
    assert circuit.programmable_bootstrap_count == 1
    per_width = circuit.programmable_bootstrap_count_per_bit_width
    # rounding can carry up to 16 (5 bits), minus 2 fused lsbs -> 3-bit PBS
    assert per_width == {3: 1}, per_width
    oracle = lambda x: table.table[(((x + 2) // 4) * 4) % 16]  # noqa: E731
    for v in (0, 5, 9, 13):
        check(circuit, oracle, v, retries=4)


def test_truncate_fused_into_consumer_tlu():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        t = fhe.truncate_bit_pattern(x, lsbs_to_remove=2)
        return fhe.univariate(lambda v: int(v) // 4 + 1)(t)

    circuit = f.compile(range(16), CFG)
    assert circuit.programmable_bootstrap_count == 1
    for v in (0, 3, 7, 12, 15):
        check(circuit, lambda x: (x // 4) * 4 // 4 + 1, v, retries=4)


def test_round_fused_signed_input():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        s = x - 8  # signed
        r = fhe.round_bit_pattern(s, lsbs_to_remove=2)
        return fhe.univariate(lambda v: abs(int(v)) // 4)(r)

    circuit = f.compile(range(16), CFG)
    assert circuit.programmable_bootstrap_count == 1
    oracle = lambda x: abs(((x - 8 + 2) // 4) * 4) // 4  # noqa: E731
    for v in (0, 3, 8, 15):
        check(circuit, oracle, v, retries=4)


def test_rounding_makes_tlu_cheaper():
    """An 8-bit value rounded to 4 bits must compile to cheaper params than
    the unrounded 8-bit TLU (the whole point of ProcessRounding)."""
    from concrete_tpu.optimizer.v0 import (cost_ks_macs, cost_pbs_macs,
                                           optimize_v0_multi)

    def mac_cost(p):
        return (cost_pbs_macs(p.n_small, p.glwe_dimension,
                              p.polynomial_size, p.pbs_level, p.pbs_base_log)
                + cost_ks_macs(p.n_big, p.n_small, p.ks_level, p.ks_base_log))

    table = fhe.LookupTable([v // 16 for v in range(256)])

    @fhe.compiler({"x": "encrypted"})
    def rounded(x):
        return table[fhe.round_bit_pattern(x, lsbs_to_remove=4)]

    @fhe.compiler({"x": "encrypted"})
    def unrounded(x):
        return table[x]

    # cap the inputset so rounding cannot carry past 8 bits (255 -> 256)
    cr = rounded.compile(range(248))
    cu = unrounded.compile(range(248))
    assert cr.programmable_bootstrap_count_per_bit_width == {4: 1}
    assert cu.programmable_bootstrap_count_per_bit_width == {8: 1}
    assert mac_cost(cr.client_specs.params) < mac_cost(cu.client_specs.params)


def test_round_not_fused_when_used_arithmetically():
    """A rounded value used outside a TLU still requires the explicit
    rounding PBS (demoted path)."""
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        r = fhe.round_bit_pattern(x, lsbs_to_remove=1)
        return r + 1

    circuit = f.compile(range(8), CFG)
    assert circuit.programmable_bootstrap_count == 1  # the explicit round
    check(circuit, lambda x: ((x + 1) // 2) * 2 + 1, 5, retries=4)


def test_trace_extension(capsys):
    """fhe.trace survives compilation as a free identity, prints in
    simulation (Tracing dialect analog, lib/Dialect/Tracing)."""
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        y = fhe.trace(x + 1, "after add")
        return y * 2

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
    circuit = f.compile(range(4), cfg)
    assert circuit.simulate(2) == 6
    out = capsys.readouterr().out
    assert "[trace] after add: 3" in out
    # execution path: the node is a free identity
    circuit.keygen(seed=9)
    for _ in range(4):
        if circuit.encrypt_run_decrypt(2) == 6:
            break
    else:
        raise AssertionError("trace circuit execution failed")


def test_dynamic_tlu():
    """Runtime-table lookup: a clear tensor input indexed by an encrypted
    value (reference DynamicTLU, Pipeline.cpp:234-245)."""
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY

    @fhe.compiler({"table": "clear", "x": "encrypted"})
    def f(table, x):
        return table[x] + 1

    inputset = [(np.random.randint(0, 8, (8,)), np.random.randint(0, 8))
                for _ in range(30)]
    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
    circuit = f.compile(inputset, cfg)
    table = np.array([5, 0, 3, 1, 7, 2, 6, 4])
    # different tables at run time, no recompilation
    assert circuit.graph(table, 2) == 4        # table[2]+1 = 3+1
    assert circuit.graph(table[::-1].copy(), 2) == 3   # rev[2]+1 = 2+1
    assert circuit.simulate(table, 2) in range(9)
    circuit.keygen(seed=13)
    for _ in range(4):
        if circuit.encrypt_run_decrypt(table, 2) == 4 \
                and circuit.encrypt_run_decrypt(table[::-1].copy(), 2) == 3:
            return
    raise AssertionError("dynamic TLU execution failed")


def test_dynamic_tlu_wrong_size_rejected():
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY

    @fhe.compiler({"table": "clear", "x": "encrypted"})
    def f(table, x):
        return table[x]

    inputset = [(np.random.randint(0, 8, (6,)), np.random.randint(0, 6))
                for _ in range(30)]
    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
    with pytest.raises(ValueError, match="entries"):
        f.compile(inputset, cfg)


def test_encrypted_by_encrypted_index_rejected():
    import concrete_tpu as fhe

    @fhe.compiler({"t": "encrypted", "x": "encrypted"})
    def f(t, x):
        return t[x]

    with pytest.raises(TypeError, match="encrypted index"):
        f.compile([(np.arange(4), 1)])


def test_multi_lookup_table():
    """A (2, 4)-shaped LookupTable applies a different table per element
    (FHELinalg apply_multi_lookup_table analog) in ONE batched PBS."""
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY
    table = fhe.LookupTable([[0, 3, 1, 2], [3, 2, 1, 0]])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    inputset = [np.random.randint(0, 4, (2,)) for _ in range(20)]
    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
    circuit = f.compile(inputset, cfg)
    x = np.array([1, 1])
    want = np.array([3, 2])
    assert np.array_equal(circuit.graph(x), want)
    # one batched PBS for the whole tensor
    assert circuit.programmable_bootstrap_count == 2
    circuit.keygen(seed=17)
    for _ in range(6):
        if np.array_equal(circuit.encrypt_run_decrypt(x), want):
            break
    else:
        raise AssertionError("multi-table TLU execution failed")
    # mapped variant: precompute table[map] in the clear
    mapped = fhe.LookupTable(np.asarray(table.table)[[1, 0]])
    assert np.array_equal(mapped._apply_clear(np.array([1, 1])), [2, 3])


def test_multi_lookup_table_shape_mismatch():
    import concrete_tpu as fhe
    table = fhe.LookupTable([[0, 1, 2, 3], [3, 2, 1, 0]])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    with pytest.raises(ValueError, match="cannot index"):
        f.compile([np.random.randint(0, 4, (3,)) for _ in range(5)])


def test_multi_lookup_table_archive():
    """Multi-table TLUs survive the deployment archive round trip."""
    import tempfile
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY
    table = fhe.LookupTable([[1, 0, 3, 2], [2, 3, 0, 1]])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
    circuit = f.compile([np.random.randint(0, 4, (2,))
                         for _ in range(20)], cfg)
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    server = fhe.Server.load(path)
    assert np.array_equal(server.graph(np.array([0, 0])), [1, 2])


def test_auto_adjust_rounders_config():
    """Configuration.auto_adjust_rounders runs the clear function over the
    inputset so AutoRounders self-calibrate before tracing (reference
    round_bit_pattern.py:74)."""
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY
    rounder = fhe.AutoRounder(target_msbs=3)

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.round_bit_pattern(x, lsbs_to_remove=rounder) // 4

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            auto_adjust_rounders=True)
    circuit = f.compile(list(range(32)), cfg)
    # 5-bit inputs, 3 target msbs -> 2 lsbs removed
    assert rounder.lsbs_to_remove == 2
    assert rounder.is_adjusted
    assert circuit.graph(21) == round(21 / 4)


def test_auto_rounder_static_adjust():
    """AutoRounder.adjust(function, inputset) — the reference's static
    calibration entry point."""
    import concrete_tpu as fhe
    rounder = fhe.AutoRounder(target_msbs=2)

    def f(x):
        return fhe.round_bit_pattern(x + 10, lsbs_to_remove=rounder)

    fhe.AutoRounder.adjust(f, list(range(22)))
    # max observed is 31 -> 5 bits -> remove 3 to keep 2 msbs
    assert rounder.lsbs_to_remove == 3


def test_hint_can_store():
    """fhe.hint(x, can_store=fhe.uint6) widens the allocation like
    bit_width=6 (regression: can_store was accepted and ignored)."""
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.hint(x + 1, can_store=fhe.uint6) + 0

    circuit = f.compile(range(3), CFG)
    widths = [circuit.client_specs.output_width(0)]
    assert max(widths) >= 6, widths
    with pytest.raises(TypeError, match="bit_width"):
        fhe.hint(1, can_store="not-a-type")
