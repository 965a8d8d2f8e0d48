"""Solver integration tests on tiny meshes (mirrors reference
``solvers/_tests/test_solver.py:24-50``)."""

import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, materialize_monolithic_csr
from perphil_tpu.solvers import Solution, solve_dpp, solve_dpp_nonlinear
from perphil_tpu.solvers import parameters as sp
from perphil_tpu.utils.manufactured_solutions import exact_expressions


def _setup(N=2, quad=True):
    mesh = create_mesh(N, N, quadrilateral=quad)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    return mesh, W, params, bcs


def _reference_solution(mesh, W, params, bcs):
    import scipy.sparse.linalg as spla
    from perphil_tpu.ops.assembly import DPPOperator, bc_values_per_field

    g1, g2 = bc_values_per_field(W, bcs)
    op = DPPOperator(W, params)
    b1, b2 = op.lifted_rhs(g1, g2)
    A, n0, _ = materialize_monolithic_csr(W, params)
    b = np.concatenate([np.asarray(b1).ravel(), np.asarray(b2).ravel()])
    return spla.spsolve(A.tocsc(), b)


@pytest.mark.parametrize(
    "params_dict",
    [
        sp.LINEAR_SOLVER_PARAMS,
        sp.PLAIN_GMRES_PARAMS,
        sp.GMRES_ILU_PARAMS,
        sp.GMRES_JACOBI_PARAMS,
        {**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS},
        {**sp.GMRES_PARAMS, **sp.FIELDSPLIT_GMRES_ILU_PARAMS},
    ],
    ids=["lu", "plain-gmres", "gmres-ilu", "gmres-jacobi", "fs-lu", "fs-gmres-ilu"],
)
def test_solve_dpp_matches_sparse_direct(params_dict):
    mesh, W, params, bcs = _setup(N=3)
    sol = solve_dpp(W, params, bcs, solver_parameters=params_dict)
    assert isinstance(sol, Solution)
    assert sol.iteration_number >= 1
    z = np.concatenate([np.asarray(d).ravel() for d in sol.solution.data])
    z_ref = _reference_solution(mesh, W, params, bcs)
    scale = np.abs(z_ref).max()
    assert np.abs(z - z_ref).max() / scale < 1e-6


def test_solve_dpp_triangles():
    mesh, W, params, bcs = _setup(N=3, quad=False)
    sol = solve_dpp(W, params, bcs, solver_parameters=sp.LINEAR_SOLVER_PARAMS)
    z = np.concatenate([np.asarray(d).ravel() for d in sol.solution.data])
    z_ref = _reference_solution(mesh, W, params, bcs)
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < 1e-9


@pytest.mark.parametrize("snes", ["ngs", "block_gs", "nrichardson"])
def test_solve_dpp_nonlinear(snes):
    mesh, W, params, bcs = _setup(N=3)
    base = dict(sp.PICARD_LU_SOLVER_PARAMS if snes != "nrichardson" else sp.RICHARDSON_SOLVER_PARAMS)
    base["snes_type"] = snes
    sol = solve_dpp_nonlinear(W, params, bcs, solver_parameters=base)
    assert sol.iteration_number >= 1
    z = np.concatenate([np.asarray(d).ravel() for d in sol.solution.data])
    z_ref = _reference_solution(mesh, W, params, bcs)
    tol = 1e-3 if snes == "nrichardson" else 1e-4
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < tol


def test_validation_errors():
    mesh, W, params, bcs = _setup()
    from perphil_tpu.forms import create_function_spaces

    _, V = create_function_spaces(mesh)
    with pytest.raises(ValueError):
        solve_dpp(V, params, bcs)
    with pytest.raises(ValueError):
        solve_dpp_nonlinear(V, params, bcs)
