"""Measurement-hygiene invariants on the committed profiling artifacts.

Round 4 shipped (briefly) host-cpu GMRES+ILU rows measured inside a
device-initialized process, where every solve paid the relayed backend's
flat ~24 ms dispatch — a 25x inflation at nx=4 that an eyeball diff almost
missed. These tests pin the project's own published bars directly to the
committed CSVs so a poisoned or regressed regeneration fails the suite:

  * every row carries a valid measurement_class provenance label,
  * every wall-clock row MATCHES OR BEATS the reference row
    (the repo's headline claim, docs/benchmarks.md),
  * iteration columns are exact except the three documented df deviation
    cells (docs/design.md section 7's authoritative table).
"""

from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).parents[1]
REF = Path("/root/reference/notebooks")

CASES = [
    (
        REPO / "notebooks/results-conforming-2d/petsc_profiling/petsc_perf_breakdown.csv",
        REF / "results-conforming-2d/petsc_profiling/petsc_perf_breakdown.csv",
    ),
    (
        REPO / "notebooks/results-conforming-2d/petsc_profiling/petsc_perf_breakdown-with-picard.csv",
        REF / "results-conforming-2d/petsc_profiling/petsc_perf_breakdown-with-picard.csv",
    ),
    (
        REPO / "notebooks/results-conforming-3d/petsc_profiling/petsc_perf_breakdown_3d.csv",
        REF / "results-conforming-3d/petsc_profiling/petsc_perf_breakdown_3d.csv",
    ),
]

# docs/design.md section 7: the authoritative df32 deviation table.
# (dim, nx, approach) -> (ours, reference)
ALLOWED_ITER_DEVIATIONS = {
    ("2d", 8, "GMRES"): (41, 40),
    ("2d", 64, "GMRES + ILU PC"): (43, 42),
    ("3d", 4, "GMRES"): (28, 27),
}

VALID_CLASSES = {"tpu-chained", "host-cpu", "cpu-x64"}


def _merged(ours_path, ref_path):
    ours = pd.read_csv(ours_path)
    ref = pd.read_csv(ref_path)
    return ours, ours.merge(ref, on=["nx", "approach"], suffixes=("_o", "_r"))


@pytest.mark.skipif(not REF.exists(), reason="reference CSVs not on this host")
@pytest.mark.parametrize("ours_path,ref_path", CASES, ids=["2d", "2d-picard", "3d"])
def test_measurement_class_labels(ours_path, ref_path):
    ours = pd.read_csv(ours_path)
    assert "measurement_class" in ours.columns, ours_path
    bad = set(ours["measurement_class"].astype(str)) - VALID_CLASSES
    assert not bad, f"unknown measurement_class values {bad} in {ours_path}"


@pytest.mark.skipif(not REF.exists(), reason="reference CSVs not on this host")
@pytest.mark.parametrize("ours_path,ref_path", CASES, ids=["2d", "2d-picard", "3d"])
def test_all_rows_match_or_beat_reference_wall_clock(ours_path, ref_path):
    _, m = _merged(ours_path, ref_path)
    assert len(m) > 0
    slow = m[m["time_total_o"] > m["time_total_r"]]
    rows = slow[["nx", "approach", "time_total_o", "time_total_r"]]
    assert slow.empty, (
        f"rows slower than the reference in {ours_path.name} (dispatch "
        f"poison or regression):\n{rows.to_string(index=False)}"
    )


@pytest.mark.skipif(not REF.exists(), reason="reference CSVs not on this host")
@pytest.mark.parametrize("ours_path,ref_path", CASES, ids=["2d", "2d-picard", "3d"])
def test_iteration_columns_exact_up_to_documented_deviations(ours_path, ref_path):
    dim = "3d" if "3d" in ours_path.name else "2d"
    _, m = _merged(ours_path, ref_path)
    for _, row in m[m["iterations_o"] != m["iterations_r"]].iterrows():
        key = (dim, int(row["nx"]), str(row["approach"]))
        allowed = ALLOWED_ITER_DEVIATIONS.get(key)
        assert allowed == (int(row["iterations_o"]), int(row["iterations_r"])), (
            f"undocumented iteration deviation at {key}: "
            f"{int(row['iterations_o'])} vs reference {int(row['iterations_r'])} "
            "(docs/design.md section 7 lists the allowed cells)"
        )
