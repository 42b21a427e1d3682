"""The v0-parameters analog tool: regenerate-and-diff golden tables.

Reference: compilers/concrete-optimizer/v0-parameters (CLI regenerating
ref/v0_last_128 and diffing against it).
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "v0_parameters.py"
UPSTREAM_TABLE = Path(
    "/root/reference/compilers/concrete-optimizer/v0-parameters/ref/"
    "v0_last_128")


def test_golden_table_regenerates_identically():
    """The committed TPU parameter table is exactly reproducible: any
    optimizer or noise-model change that shifts a chosen parameter or a
    predicted p_error fails this test (the reference's regenerate-and-diff
    workflow)."""
    out = subprocess.run([sys.executable, str(TOOL), "diff"],
                         capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr


def test_reference_table_rows_are_noise_feasible():
    """Every row of the upstream optimizer's golden table must be
    reproduced by our noise model within 2x on p_error (measured worst
    deviation: 1.01x over 235 rows)."""
    import pytest
    if not UPSTREAM_TABLE.exists():
        pytest.skip("upstream reference tree not available")
    out = subprocess.run(
        [sys.executable, str(TOOL), "check-reference", str(UPSTREAM_TABLE)],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "0 violations" in out.stdout
