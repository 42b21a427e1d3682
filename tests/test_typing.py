"""Graph type-inference / validation tests (representation/typing.py):
well-formed graphs pass; corrupted deployment archives fail closed.
"""

import json
import tempfile
import zipfile

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.params import TEST_PARAMS_TINY
from concrete_tpu.representation.typing import GraphTypeError, validate_graph

CFG = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY)


def _circuit():
    table = fhe.LookupTable([1, 0, 3, 2])

    @fhe.compiler({"x": "encrypted", "y": "clear"})
    def f(x, y):
        return table[x] + y

    return f.compile([(i, j) for i in range(4) for j in range(2)], CFG)


def test_valid_graph_passes():
    circuit = _circuit()
    validate_graph(circuit.graph)           # traced graph
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    server = fhe.Server.load(path)          # load path runs validation
    validate_graph(server.graph)


def _tamper(path: str, out_path: str, mutate) -> None:
    """Rewrite graph.json with `mutate(record)` applied."""
    with zipfile.ZipFile(path) as z:
        entries = {n: z.read(n) for n in z.namelist()}
    record = json.loads(entries["graph.json"].decode())
    mutate(record)
    entries["graph.json"] = json.dumps(record).encode()
    with zipfile.ZipFile(out_path, "w") as z:
        for n, blob in entries.items():
            z.writestr(n, blob)


@pytest.mark.parametrize("mutate, reason", [
    (lambda r: r["nodes"][-1]["output"].update(shape=[3]),
     "output shape lie"),
    (lambda r: r["nodes"][-1]["output"].update(bit_width=99),
     "absurd bit width"),
    (lambda r: r["edges"].pop(),
     "missing operand edge"),
    (lambda r: next(n for n in r["nodes"]
                    if n.get("encoding_width") is not None)
     .update(encoding_width=77),
     "absurd encoding width"),
])
def test_corrupted_archive_rejected(mutate, reason):
    circuit = _circuit()
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    bad = tempfile.mktemp(suffix=".zip")
    _tamper(path, bad, mutate)
    with pytest.raises(GraphTypeError, match=r"%\d+ \["):
        fhe.Server.load(bad)


def test_encryption_flip_rejected():
    circuit = _circuit()
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    bad = tempfile.mktemp(suffix=".zip")

    def flip(record):
        # claim the clear operand of the add is encrypted
        for n in record["nodes"]:
            if n["name"] == "add":
                n["inputs"][1]["is_encrypted"] = True
    _tamper(path, bad, flip)
    with pytest.raises(GraphTypeError):
        fhe.Server.load(bad)


def test_multivariate_archive_roundtrip():
    """enc % enc lowers to a multivariate TLU; its archive must be data-only
    and still executable after Server.load (review finding: the callable
    kwarg was silently dropped, corrupting every such archive)."""
    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return x % y

    inputset = [(np.random.randint(0, 8), np.random.randint(1, 4))
                for _ in range(30)]
    circuit = f.compile(inputset, CFG)
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    server = fhe.Server.load(path)
    circuit.keygen(seed=31)
    for _ in range(4):
        enc = circuit.encrypt(7, 3)
        out = server.run(*enc, evaluation_keys=circuit._evaluation_keys())
        if circuit.decrypt(out[0]) == 1:
            return
    raise AssertionError("archived multivariate circuit failed")


def test_extract_bits_and_trace_archive_roundtrip():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[1] + fhe.trace(x, "x") * 0

    circuit = f.compile(range(8), CFG)
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)
    server = fhe.Server.load(path)
    assert server.graph(6) == 1
