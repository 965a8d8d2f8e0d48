"""3D convergence driver tests."""

import pytest

from perphil_tpu.experiments.convergence_2d import SolverSpec, compute_eoc
from perphil_tpu.experiments.convergence_3d import run_one_3d
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.solvers.parameters import LINEAR_SOLVER_PARAMS


def test_run_one_3d_schema():
    row = run_one_3d(
        4, SolverSpec("mumps", LINEAR_SOLVER_PARAMS), hexahedral=True,
        params=DPPParameters(), quadrature_degree=6,
    )
    assert row["it"] == 1 and row["hex"] == 1
    assert row["e1_L2"] > 0 and row["e2_L2"] > row["e1_L2"]


@pytest.mark.slow
@pytest.mark.regression
def test_3d_hex_l2_convergence_order():
    params = DPPParameters()
    spec = SolverSpec("mumps", LINEAR_SOLVER_PARAMS)
    rows = [
        run_one_3d(N, spec, hexahedral=True, params=params, quadrature_degree=8)
        for N in (4, 8, 16)
    ]
    eoc = {(e["solver"], e["err"]): e["slope"] for e in compute_eoc(rows)}
    # Q1 in 3D: L2 order ~2 (boundary-layer MMS gives ~1.9 like in 2D)
    assert 1.7 < eoc[("mumps", "e1_L2")] < 2.2
    assert 0.8 < eoc[("mumps", "e1_H1s")] < 1.2
