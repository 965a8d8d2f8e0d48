"""docs/benchmarks.md must agree with the CSV artifacts it reports.

Round 3 shipped a report whose tables and narrative contradicted the very
CSVs they were generated from (the generator was never re-run after a CSV
regeneration, and its narrative numbers were hardcoded prose). The
generator now computes every number from the CSVs; this test regenerates
the report into a scratch file and requires it to be byte-identical to
the committed one — any CSV change without a report re-run fails here.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parents[1]
GEN = REPO / "notebooks" / "compare_with_reference.py"
COMMITTED = REPO / "docs" / "benchmarks.md"


@pytest.mark.skipif(
    not Path("/root/reference/notebooks").exists(),
    reason="reference CSVs not present on this host",
)
def test_benchmarks_report_matches_artifacts(tmp_path):
    out = tmp_path / "benchmarks.md"
    env = dict(os.environ, PERPHIL_BENCHREPORT_OUT=str(out), JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, str(GEN)], check=True, env=env,
        capture_output=True, timeout=300,
    )
    assert out.read_text() == COMMITTED.read_text(), (
        "docs/benchmarks.md is stale: a CSV artifact changed without "
        "re-running notebooks/compare_with_reference.py (run "
        "`python notebooks/compare_with_reference.py`)"
    )
