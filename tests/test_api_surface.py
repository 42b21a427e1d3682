"""Round-2 API-surface additions: EvaluationKeys, fhe.array, fhe.inputset,
composition policies — matching the reference's concrete.fhe exports.
"""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def test_evaluation_keys_are_secret_free_and_run():
    """Client ships EvaluationKeys (public material only) to the server;
    the server runs with the deserialized object (reference
    Client.evaluation_keys / fhe.EvaluationKeys)."""
    table = fhe.LookupTable([2, 3, 0, 1])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    c = f.compile(range(4), CFG)
    c.keygen(seed=21)
    ek = c.client.evaluation_keys
    blob = ek.serialize()
    # no secret key material in the payload
    import io
    with np.load(io.BytesIO(blob), allow_pickle=False) as z:
        names = set(z.files)
    assert "bsk" in names and "ksk" in names
    assert not names & {"glwe", "lwe_small"}, names
    ek2 = fhe.EvaluationKeys.deserialize(blob)
    for _ in range(4):
        enc = c.encrypt(1)
        out = c.server.run(enc, evaluation_keys=ek2)
        if c.decrypt(out[0]) == 3:
            return
    raise AssertionError("server run with shipped EvaluationKeys failed")


def test_fhe_array():
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        a = fhe.array([x, y, 3])
        return np.sum(a)

    c = f.compile([(i, j) for i in range(4) for j in range(4)], CFG)
    assert c.graph(2, 3) == 8
    c.keygen(seed=22)
    for _ in range(4):
        if c.encrypt_run_decrypt(2, 3) == 8:
            return
    raise AssertionError("fhe.array circuit failed")


def test_fhe_inputset():
    samples = fhe.inputset(fhe.uint3, fhe.tensor[fhe.uint2, 4], n=50,
                           seed=1)
    assert len(samples) == 50
    for x, t in samples:
        assert 0 <= x <= 7
        assert t.shape == (4,) and t.max() <= 3

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    c = f.compile(fhe.inputset(fhe.uint3, n=30, seed=2), CFG)
    assert c.simulate(7) == 8


def test_composition_policies():
    @fhe.module()
    class Composable:
        @fhe.function({"x": "encrypted"})
        def double(x):
            return (x * 2) % 8

        @fhe.function({"x": "encrypted"})
        def inc(x):
            return (x + 1) % 8

    m = Composable.compile({"double": range(8), "inc": range(8)},
                           CFG)
    m.keygen(seed=23)
    # chain across functions: inc(double(3)) = 7
    for _ in range(4):
        enc = m.double.client.encrypt(3)
        mid = m.double.run(enc)
        out = m.inc.run(mid)
        if m.inc.client.decrypt(out) == 7:
            break
    else:
        raise AssertionError("composable module chain failed")

    @fhe.module()
    class Isolated:
        composition = fhe.NotComposable()

        @fhe.function({"x": "encrypted"})
        def small(x):
            return x + 1

        @fhe.function({"x": "encrypted"})
        def big(x):
            return (x + 1) % 32

    m2 = Isolated.compile({"small": range(2), "big": range(31)}, CFG)
    # NotComposable: each function keeps its own widths — `small`'s values
    # are narrower than `big`'s
    w_small = max(n.properties.get("encoding_width", 0)
                  for n in m2.small.graph.graph.nodes
                  if n.output.is_encrypted)
    w_big = max(n.properties.get("encoding_width", 0)
                for n in m2.big.graph.graph.nodes
                if n.output.is_encrypted)
    assert w_small < w_big

    # Wired policy type-checks and unifies the wired functions
    assert isinstance(fhe.Wired([fhe.Wire(fhe.Output("f", 0),
                                          fhe.Input("g", 0))]),
                      fhe.CompositionPolicy)


def test_range_restriction_compiles():
    """RangeRestriction must be hashable (review finding: the lru_cached
    optimizer crashed on it) and actually restrict the search."""
    r = fhe.RangeRestriction(glwe_log_polynomial_sizes=(11,),
                             glwe_dimensions=(1,))

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return (x + 1) % 4

    circuit = f.compile(range(4),
                        fhe.Configuration(range_restriction=r))
    p = circuit.client_specs.params
    assert p.polynomial_size == 1 << 11
    assert p.glwe_dimension == 1


def test_array_with_clear_tracer_entry():
    """fhe.array mixing an encrypted scalar with a CLEAR tracer entry
    (review finding: the executor stacked raw clear values and crashed)."""
    @fhe.compiler({"x": "encrypted", "c": "clear"})
    def f(x, c):
        return np.sum(fhe.array([x, c]))

    circuit = f.compile([(i, j) for i in range(4) for j in range(4)],
                        CFG)
    circuit.keygen(seed=33)
    for _ in range(4):
        if circuit.encrypt_run_decrypt(2, 3) == 5:
            return
    raise AssertionError("array with clear tracer failed")


def test_wop_cache_never_stores_foreign_keysets(tmp_path):
    """Keys generated from an injected (shared) glwe key must never land
    in the insecure cache, including via wop_evaluation's refresh."""
    from concrete_tpu.compilation.keys import Keys
    from concrete_tpu.core.wop import WopParams
    from concrete_tpu.params import TEST_PARAMS_TINY_WIDE as P
    cache = str(tmp_path)
    normal = Keys(P, cache_directory=cache)
    normal.generate(seed=None)
    import os
    files = {f: os.path.getmtime(os.path.join(cache, f))
             for f in os.listdir(cache)}
    assert files, "normal keyset should be cached"
    foreign = Keys(P, cache_directory=cache)
    shared = np.random.default_rng(0).integers(
        0, 2, (P.glwe_dimension, P.polynomial_size)).astype(np.uint64)
    foreign.generate(seed=None, glwe_key=shared)
    wp = WopParams(base=P, cbs_level=3, cbs_base_log=6,
                   pfks_level=8, pfks_base_log=4)
    foreign.wop_evaluation(wp)
    files2 = {f: os.path.getmtime(os.path.join(cache, f))
              for f in os.listdir(cache)}
    assert files2 == files, "foreign keyset leaked into the cache"


def test_not_composable_module_runs_correctly():
    """NotComposable functions keep per-value widths; the client must
    encode/decode at those widths (review finding: specs omitted
    input/output widths so results were garbage)."""
    @fhe.module()
    class Isolated2:
        composition = fhe.NotComposable()

        @fhe.function({"x": "encrypted"})
        def small(x):
            return x + 1

        @fhe.function({"x": "encrypted"})
        def big(x):
            return (x + 1) % 32

    m = Isolated2.compile({"small": range(2), "big": range(31)},
                          fhe.Configuration(
                              forced_parameters=TEST_PARAMS_TINY))
    m.keygen(seed=41)
    for _ in range(4):
        if m.small.encrypt_run_decrypt(1) == 2 \
                and m.big.encrypt_run_decrypt(30) == 31:
            return
    raise AssertionError("NotComposable module returned wrong results")


def test_wired_unknown_function_rejected():
    with pytest.raises(ValueError, match="unknown module function"):
        @fhe.module()
        class Bad:
            composition = fhe.Wired([fhe.Wire(fhe.Output("nope", 0),
                                              fhe.Input("inc", 0))])

            @fhe.function({"x": "encrypted"})
            def inc(x):
                return x + 1

        Bad.compile({"inc": range(4)},
                    fhe.Configuration(forced_parameters=TEST_PARAMS_TINY))


def test_array_rejects_tensor_entries():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.array([x])     # x is a tensor -> must fail fast

    with pytest.raises(ValueError, match="scalars"):
        f.compile([np.array([1, 2, 3])],
                  fhe.Configuration(forced_parameters=TEST_PARAMS_TINY))


def test_show_flags_smoke(capsys):
    """show_graph/show_mlir/show_optimizer/show_bit_width_assignments and
    show_progress all print something and never crash."""
    table = fhe.LookupTable([0, 2, 1, 3])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x] + 1

    cfg = fhe.Configuration(
        forced_parameters=TEST_PARAMS_TINY, show_graph=True, show_mlir=True,
        show_optimizer=True, show_bit_width_assignments=True,
        show_statistics=True, show_progress=True, progress_title="demo")
    f.compile(range(4), cfg)
    out = capsys.readouterr().out
    assert "keyswitch+pbs" in out          # show_mlir lowering plan
    assert "[demo] tracing" in out         # show_progress
    assert "bits" in out                   # width assignments


def test_approximate_rounding_skips_bias():
    """Exactness.APPROXIMATE truncation skips the half-step bias (cheaper,
    off-by-half on ties) but still computes a plausible rounding."""
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.truncate_bit_pattern(x, lsbs_to_remove=2) // 4

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            rounding_exactness="approximate")
    circuit = f.compile(list(range(16)), cfg)
    circuit.keygen(seed=51)
    got = circuit.encrypt_run_decrypt(13)
    assert got in (2, 3, 4)   # 13//4=3 with a half-step tolerance


def test_evaluation_keys_with_wop(tmp_path):
    """EvaluationKeys carries PFPKSKs; a wide-TLU circuit runs from the
    deserialized public material."""
    from concrete_tpu.params import TEST_PARAMS_TINY_WIDE
    table = fhe.LookupTable([(v + 3) % 16 for v in range(1 << 10)])

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return table[x]

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY_WIDE,
                            forced_wop_parameters=(3, 6, 8, 4))
    c = f.compile([0, 513, 1023], cfg)
    c.keygen(seed=52)
    # materialize the PFPKSK on the client, then ship public material
    c.keys.wop_evaluation(c.client_specs.wop_params())
    ek = fhe.EvaluationKeys.deserialize(c.client.evaluation_keys.serialize())
    for _ in range(4):
        enc = c.encrypt(513)
        out = c.server.run(enc, evaluation_keys=ek)
        if c.decrypt(out[0]) == (513 + 3) % 16:
            return
    raise AssertionError("WoP run from shipped EvaluationKeys failed")


def test_compress_input_ciphertexts_config():
    """compress_input_ciphertexts makes Circuit.encrypt emit seeded
    ciphertexts, which Server.run decompresses transparently."""
    from concrete_tpu.core.compression import SeededLweCiphertext

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            compress_input_ciphertexts=True)
    c = f.compile(range(4), cfg)
    c.keygen(seed=61)
    enc = c.encrypt(2)
    assert isinstance(enc, SeededLweCiphertext)
    assert c.decrypt(c.run(enc)) == 3


def test_simulation_only_build():
    """fhe_simulation=True + fhe_execution=False routes
    encrypt_run_decrypt through the simulator (no keys)."""
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            fhe_simulation=True, fhe_execution=False)
    c = f.compile(range(4), cfg)
    assert c.encrypt_run_decrypt(2) == 3   # no keygen happened
    assert not c.keys.are_generated


def test_every_reference_export_exists():
    """Static parity: every public name exported by the reference's
    concrete.fhe __init__ exists on concrete_tpu."""
    import ast
    from pathlib import Path

    ref_init = Path("/root/reference/frontends/concrete-python/concrete/"
                    "fhe/__init__.py")
    if not ref_init.exists():
        pytest.skip("reference tree not available")
    names = set()
    for node in ast.walk(ast.parse(ref_init.read_text())):
        if isinstance(node, (ast.ImportFrom, ast.Import)):
            for alias in node.names:
                names.add(alias.asname or alias.name.split(".")[0])
    missing = sorted(n for n in names
                     if not n.startswith("_") and not hasattr(fhe, n))
    assert missing == [], missing


def test_zeros_like_ones_like():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return np.sum(fhe.ones_like(x) + fhe.zeros_like(x)) + np.sum(x)

    c = f.compile([np.array([0, 1, 2])], CFG)
    assert c.graph(np.array([1, 1, 1])) == 6
    for _ in range(4):
        if c.encrypt_run_decrypt(np.array([1, 1, 1])) == 6:
            return
    raise AssertionError("zeros_like/ones_like circuit failed")


def test_wide_annotations_and_floats():
    """int17..int64 / f32/f64 annotations exist; wide widths give exact
    ranges (used by direct circuits and tfhers dtypes)."""
    assert fhe.uint24.dtype_range == (0, 2**24 - 1)
    assert fhe.int40.dtype_range == (-(2**39), 2**39 - 1)
    assert fhe.tensor[fhe.uint20, 3].shape == (3,)
    assert fhe.f32.is_float and fhe.f64.bit_width == 64
