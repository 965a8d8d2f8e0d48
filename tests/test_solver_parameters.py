"""Preset-dict invariants (mirrors reference
``solvers/_tests/test_solver_parameters.py:1-26``) — pure Python, no JAX."""

from perphil_tpu.solvers import parameters as sp


def test_linear_solver_params():
    assert sp.LINEAR_SOLVER_PARAMS["ksp_type"] == "preonly"
    assert sp.LINEAR_SOLVER_PARAMS["pc_type"] == "lu"


def test_gmres_params():
    assert sp.GMRES_PARAMS["ksp_type"] == "gmres"
    assert sp.GMRES_PARAMS["ksp_rtol"] == 1.0e-8
    assert sp.GMRES_PARAMS["ksp_atol"] == 1.0e-12
    assert sp.GMRES_PARAMS["ksp_max_it"] == 50000


def test_plain_and_preconditioned_variants():
    assert sp.PLAIN_GMRES_PARAMS["pc_type"] == "none"
    assert sp.GMRES_JACOBI_PARAMS["pc_type"] == "jacobi"
    assert sp.GMRES_ILU_PARAMS["pc_type"] == "ilu"
    assert sp.GMRES_ILU_PARAMS["pc_factor_levels"] == 0


def test_fieldsplit_presets():
    for preset in (
        sp.FIELDSPLIT_LU_PARAMS,
        sp.FIELDSPLIT_GMRES_PARAMS,
        sp.FIELDSPLIT_GMRES_ILU_PARAMS,
    ):
        assert preset["pc_type"] == "fieldsplit"
        assert preset["pc_fieldsplit_type"] == "multiplicative"
        assert "fieldsplit_0" in preset and "fieldsplit_1" in preset


def test_picard_presets():
    assert sp.RICHARDSON_SOLVER_PARAMS["snes_type"] == "nrichardson"
    assert sp.RICHARDSON_SOLVER_PARAMS["snes_linesearch_damping"] == 0.5
    for preset in (
        sp.PICARD_LU_SOLVER_PARAMS,
        sp.PICARD_GMRES_SOLVER_PARAMS,
        sp.PICARD_GMRES_ILU_SOLVER_PARAMS,
    ):
        assert preset["snes_type"] == "ngs"
        assert preset["snes_rtol"] == 1e-8
    assert sp.KSP_PREONLY_PARAMS["snes_type"] == "ksponly"
