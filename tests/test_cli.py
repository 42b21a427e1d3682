"""CLI smoke test (compile/inspect/keygen/run round trip, tiny params)."""

import sys


def test_cli_roundtrip(tmp_path):
    circ = tmp_path / "c.py"
    circ.write_text(
        "import concrete_tpu as fhe\n"
        "from concrete_tpu.params import TEST_PARAMS_TINY\n"
        "@fhe.compiler({'x': 'encrypted'})\n"
        "def f(x):\n"
        "    return x + 1\n")
    from concrete_tpu.__main__ import main
    archive = str(tmp_path / "s.zip")
    keys = str(tmp_path / "k.bin")
    assert main(["compile", str(circ), "--function", "f",
                 "--inputset", "0:4", "--output", archive]) == 0
    assert main(["inspect", archive]) == 0
    assert main(["keygen", archive, "--output", keys, "--seed", "7"]) == 0
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["run", archive, "--keys", keys, "--args", "2"]) == 0
    assert buf.getvalue().strip() == "3"
