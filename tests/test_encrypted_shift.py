"""Encrypted-by-encrypted shift lowerings (reference mlir/context.py:3472):
packed one-TLU when the packed width fits natively, the chunked per-bit
strategy for wide right shifts, packed-WoP for wide left shifts."""

import numpy as np

import concrete_tpu as fhe
from concrete_tpu.params import CryptoParams, TEST_PARAMS_TINY_WIDE

# N=512 tiny params: the chunked strategy's packed TLUs run at
# native-1 = 7 bits, which N=256 cannot decode reliably (NOT SECURE).
TEST_PARAMS_512 = CryptoParams(
    n_small=16, glwe_dimension=1, polynomial_size=512,
    pbs_level=2, pbs_base_log=12, ks_level=2, ks_base_log=8,
    lwe_std=2.0 ** -25, glwe_std=2.0 ** -35, security_level=0)


def check(circuit, function, *sample, retries=4):
    for attempt in range(retries):
        got = circuit.encrypt_run_decrypt(*sample)
        want = function(*[np.asarray(s) for s in sample])
        if np.array_equal(np.asarray(got), np.asarray(want)):
            return
        if attempt == retries - 1:
            raise AssertionError(f"{got} != {want} for {sample}")
        circuit.keygen(force=True)


CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY_WIDE)
CFG512 = fhe.Configuration(forced_parameters=TEST_PARAMS_512)


def test_right_shift_packed_small():
    """px + pb <= native: single packed multivariate TLU."""
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return x >> y

    inputset = [(np.random.randint(0, 8), np.random.randint(0, 4))
                for _ in range(20)] + [(7, 3), (7, 0)]
    circuit = f.compile(inputset, CFG)
    assert circuit.programmable_bootstrap_count == 1
    for vx, vy in ((7, 0), (7, 2), (5, 1), (6, 3)):
        check(circuit, lambda x, y: x >> y, vx, vy)


def test_left_shift_packed_small():
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return x << y

    inputset = [(np.random.randint(0, 8), np.random.randint(0, 4))
                for _ in range(20)] + [(7, 3), (7, 0)]
    circuit = f.compile(inputset, CFG)
    assert circuit.programmable_bootstrap_count == 1
    for vx, vy in ((7, 0), (7, 3), (5, 2), (1, 3)):
        check(circuit, lambda x, y: x << y, vx, vy)


def test_right_shift_chunked_wide():
    """px + pb > native: the chunked per-bit strategy (no WoP keys)."""
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return x >> y

    # px = 7, pb = 2 -> packed 9 > native 8 at N=512
    inputset = [(np.random.randint(0, 128), np.random.randint(0, 4))
                for _ in range(20)] + [(127, 3), (127, 0)]
    circuit = f.compile(inputset, CFG512)
    assert circuit.client_specs.wop_gadgets is None
    assert circuit.programmable_bootstrap_count > 1, \
        "chunked lowering expected, got packed"
    for vx, vy in ((127, 0), (127, 1), (127, 3), (65, 2), (8, 3)):
        check(circuit, lambda x, y: x >> y, vx, vy)


def test_shift_pbs_count_matches_strategy_model():
    """Chunked cost model: per b-bit, 1 should-TLU + per chunk
    (1 chunk TLU + 1 verdict TLU); shifter never grows for right shifts."""
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return x >> y

    inputset = [(np.random.randint(0, 128), np.random.randint(0, 4))
                for _ in range(20)] + [(127, 3)]
    circuit = f.compile(inputset, CFG512)
    native = 8                       # N=512 -> min(8, log2(512)+1-2)
    px, pb = 7, 2
    chunk_in = native - 2
    n_chunks = -(-px // chunk_in)    # shifter stays within px bits
    expect = pb * (1 + 2 * n_chunks)
    assert circuit.programmable_bootstrap_count == expect, (
        circuit.programmable_bootstrap_count, expect)


def test_wide_left_shift_stays_packed():
    """Wide enc << enc keeps the single packed multivariate TLU (chunking
    it would need wide intermediate TLUs costing more than one packed WoP
    TLU; see chunk_wide_encrypted_shifts doc) — graph-level policy check."""
    from concrete_tpu.compilation.transforms import \
        chunk_wide_encrypted_shifts
    from concrete_tpu.tracing.tracer import Tracer

    def f(x, y):
        return x << y

    graph = Tracer.trace(f, {"x": "encrypted", "y": "encrypted"})
    graph.measure_bounds([(np.random.randint(0, 64),
                           np.random.randint(0, 8)) for _ in range(20)]
                         + [(63, 7)])
    graph.update_dtypes_from_bounds()
    assert chunk_wide_encrypted_shifts(graph, native_bits=8) == 0
    names = [n.name for n in graph.graph.nodes]
    assert names.count("multivariate") == 1
