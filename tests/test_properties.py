"""Property-based fuzzing of the exact-arithmetic primitives (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from concrete_tpu.core import limbs as lb
from concrete_tpu.core import refimpl as ref

u64s = st.integers(min_value=0, max_value=(1 << 64) - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(u64s, min_size=1, max_size=64))
def test_u64_limb_roundtrip_prop(values):
    x = np.array(values, dtype=np.uint64)
    planes = lb.u64_to_balanced_i8(x)
    rec = lb.recombine_i32_planes_to_u64(planes.astype(np.int32))
    assert np.array_equal(rec, x)


@settings(max_examples=100, deadline=None)
@given(u64s, st.integers(2, 23), st.integers(1, 4))
def test_decompose_soundness_prop(value, base_log, levels):
    if base_log * levels > 63:
        return
    v = np.array([value], dtype=np.uint64)
    digits = ref.decompose(v, base_log, levels)
    half = 1 << (base_log - 1)
    assert digits.max() <= half and digits.min() >= -half
    rec = ref.recompose(digits, base_log)
    err = int((rec - v)[0].astype(np.int64))
    assert abs(err) <= 1 << (64 - levels * base_log - 1)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 8), st.integers(0, 255))
def test_encode_decode_prop(p, raw):
    m = raw % (1 << p)
    assert int(ref.decode(ref.encode(m, p), p)) == m
    s = m - (1 << (p - 1))
    assert int(ref.decode(ref.encode(s, p), p, signed=True)) == s


@settings(max_examples=40, deadline=None)
@given(st.integers(0, (1 << 64) - 1), st.integers(4, 7))
def test_modswitch_bounds_prop(value, logn):
    out = int(ref.modulus_switch(np.uint64(value), logn))
    assert 0 <= out < (1 << (logn + 1))
    # round trip within half a switched unit
    back = out * (1 << (64 - logn - 1)) % (1 << 64)
    diff = (back - value) % (1 << 64)
    if diff > 1 << 63:
        diff = (1 << 64) - diff
    assert diff <= 1 << (64 - logn - 2)


@settings(max_examples=30, deadline=None)
@given(st.lists(u64s, min_size=8, max_size=8),
       st.lists(st.integers(-(1 << 20), 1 << 20), min_size=8, max_size=8))
def test_polymul_linearity_prop(avals, bvals):
    a = np.array(avals, dtype=np.uint64)
    b = np.array(bvals, dtype=np.int64).astype(np.uint64)
    # (a + a) (*) b == 2 * (a (*) b)  (mod 2^64)
    lhs = ref.negacyclic_polymul(a + a, b)
    rhs = ref.negacyclic_polymul(a, b) * np.uint64(2)
    assert np.array_equal(lhs, rhs)
    # X * (a (*) b) == (X * a) (*) b
    lhs2 = ref.monomial_mul(ref.negacyclic_polymul(a, b), 1)
    rhs2 = ref.negacyclic_polymul(ref.monomial_mul(a, 1), b)
    assert np.array_equal(lhs2, rhs2)


# -- round-2 features: chunked comparisons, dynamic TLU (clear semantics) -----

@settings(max_examples=20, deadline=None)
@given(st.integers(0, 31), st.integers(0, 31),
       st.sampled_from(["gt", "ge", "lt", "le", "eq", "ne"]))
def test_chunked_comparison_prop(a, b, op):
    """The chunked rewrite preserves exact comparison semantics on the
    full operand domain (clear graph evaluation)."""
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY
    fns = {"gt": lambda x, y: x > y, "ge": lambda x, y: x >= y,
           "lt": lambda x, y: x < y, "le": lambda x, y: x <= y,
           "eq": lambda x, y: x == y, "ne": lambda x, y: x != y}
    fn = fns[op]
    key = ("cmp", op)
    circuit = _CIRCUIT_CACHE.get(key)
    if circuit is None:
        def make(fn):
            @fhe.compiler({"x": "encrypted", "y": "encrypted"})
            def f(x, y):
                return fn(x, y)
            return f
        cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
        inputset = [(i, j) for i in (0, 31) for j in (0, 31)]
        circuit = make(fn).compile(inputset, cfg)
        # 5-bit operands with a 6-bit signed diff at TINY params (native 5)
        # must have been chunked: no WoP specs
        assert not circuit.server._executor.wop_specs
        _CIRCUIT_CACHE[key] = circuit
    assert circuit.graph(a, b) == int(fn(a, b))


_CIRCUIT_CACHE: dict = {}


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 7), min_size=8, max_size=8),
       st.integers(0, 7))
def test_dynamic_tlu_prop(table, idx):
    import concrete_tpu as fhe
    from concrete_tpu.params import TEST_PARAMS_TINY
    circuit = _CIRCUIT_CACHE.get("dyn")
    if circuit is None:
        @fhe.compiler({"table": "clear", "x": "encrypted"})
        def f(table, x):
            return table[x]
        cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)
        inputset = [(np.random.randint(0, 8, (8,)),
                     np.random.randint(0, 8)) for _ in range(30)]
        circuit = f.compile(inputset, cfg)
        _CIRCUIT_CACHE["dyn"] = circuit
    t = np.asarray(table)
    assert circuit.graph(t, idx) == t[idx]
