"""Convergence-experiment tests: row schema, CSV writing, and the headline
EOC slopes (reference convergence_eoc.csv: L2 ~1.94, H1s ~0.945)."""

import csv

import pytest

from perphil_tpu.experiments.convergence_2d import (
    SolverSpec,
    _default_solvers,
    compute_eoc,
    main,
    run_one,
)
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.solvers.parameters import LINEAR_SOLVER_PARAMS


def test_run_one_schema():
    row = run_one(
        N=4, solver=SolverSpec("mumps", LINEAR_SOLVER_PARAMS), quad=True,
        degree=1, params=DPPParameters(),
    )
    assert set(row) == {
        "N", "h", "degree", "quad", "solver", "it", "res",
        "e1_L2", "e2_L2", "e1_H1s", "e2_H1s",
    }
    assert row["it"] == 1 and row["h"] == 0.25


def test_default_solvers():
    specs = _default_solvers([1e-8])
    names = [s.name for s in specs]
    assert names[0] == "mumps"
    assert any("gmres_rtol" in n for n in names)
    assert any("fs-lu" in n for n in names)


@pytest.mark.regression
def test_eoc_slopes_match_reference():
    """L2 EOC ~1.939, H1-seminorm EOC ~0.945 (convergence_eoc.csv)."""
    params = DPPParameters()
    spec = SolverSpec("mumps", LINEAR_SOLVER_PARAMS)
    rows = [run_one(N=N, solver=spec, quad=True, degree=1, params=params)
            for N in (8, 16, 32)]
    eoc = {(e["solver"], e["err"]): e["slope"] for e in compute_eoc(rows)}
    assert abs(eoc[("mumps", "e1_L2")] - 1.939) < 0.05
    assert abs(eoc[("mumps", "e2_L2")] - 1.939) < 0.05
    assert abs(eoc[("mumps", "e1_H1s")] - 0.945) < 0.05


def test_main_writes_csv(tmp_path):
    out = tmp_path / "conv.csv"
    eoc_out = tmp_path / "eoc.csv"
    main(["--Ns", "4", "--rtols", "1e-8", "--out", str(out), "--eoc-out", str(eoc_out)])
    with out.open() as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3  # mumps + gmres + fieldsplit
    assert {r["solver"] for r in rows} == {
        "mumps", "gmres_rtol=1e-08", "fs-lu_gmres_rtol=1e-08",
    }
    with eoc_out.open() as f:
        assert len(list(csv.DictReader(f))) == 0  # single N -> no slopes
