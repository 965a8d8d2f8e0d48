"""Runtime option-override tests (options_prefix parity with PETSc's
options database, reference solver.py:35,84)."""

import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC
from perphil_tpu.solvers import parameters as sp
from perphil_tpu.solvers import solve_dpp
from perphil_tpu.solvers.options import (
    apply_prefix_overrides,
    clear_options,
    options_for,
    set_options,
)
from perphil_tpu.utils.manufactured_solutions import exact_expressions


@pytest.fixture(autouse=True)
def _clean():
    clear_options()
    yield
    clear_options()


def test_set_and_apply():
    set_options("dpp", ksp_rtol=1e-4)
    merged = apply_prefix_overrides(sp.PLAIN_GMRES_PARAMS, "dpp")
    assert merged["ksp_rtol"] == 1e-4
    assert merged["pc_type"] == "none"
    # other prefixes untouched
    assert apply_prefix_overrides(sp.PLAIN_GMRES_PARAMS, "other") is sp.PLAIN_GMRES_PARAMS


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("PERPHIL_TPU_OPTIONS", "dpp_ksp_rtol=1e-3 dpp_pc_type=jacobi x_y=1")
    opts = options_for("dpp")
    assert opts == {"ksp_rtol": 1e-3, "pc_type": "jacobi"}


def test_override_changes_solve():
    mesh = create_mesh(8, 8)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    base = solve_dpp(W, params, bcs, solver_parameters=sp.PLAIN_GMRES_PARAMS)
    set_options("dpp", ksp_rtol=1e-2)
    loose = solve_dpp(W, params, bcs, solver_parameters=sp.PLAIN_GMRES_PARAMS)
    assert loose.iteration_number < base.iteration_number
