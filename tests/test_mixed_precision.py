"""Double-float arithmetic and mixed-precision direct solver tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, DPPOperator
from perphil_tpu.ops.df32 import (
    df_add,
    df_apply_stencil,
    df_from_f64,
    df_mul,
    df_to_f64,
    two_prod,
    two_sum,
)
from perphil_tpu.ops.direct import FastDiagDPPSolver
from perphil_tpu.ops.mixed import MixedPrecisionDPPDirect
from perphil_tpu.ops.stencil import apply_stencil, compile_stencils


def test_two_sum_error_free():
    a = jnp.float32(1.0)
    b = jnp.float32(1e-8)
    s, e = two_sum(a, b)
    assert float(s) == 1.0
    assert float(e) == pytest.approx(1e-8, rel=1e-6)


def test_two_prod_error_free():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(100), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(100), dtype=jnp.float32)
    p, e = two_prod(a, b)
    exact = np.asarray(a, dtype=np.float64) * np.asarray(b, dtype=np.float64)
    recon = np.asarray(p, dtype=np.float64) + np.asarray(e, dtype=np.float64)
    assert np.abs(recon - exact).max() < 1e-14 * np.abs(exact).max()


def test_df_roundtrip_and_ops():
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(1000)
    y64 = rng.standard_normal(1000)
    x = df_from_f64(x64)
    y = df_from_f64(y64)
    assert np.abs(np.asarray(df_to_f64(x)) - x64).max() < 1e-14
    s = df_to_f64(df_add(x, y))
    assert np.abs(np.asarray(s) - (x64 + y64)).max() < 1e-13
    m = df_to_f64(df_mul(x, y))
    assert np.abs(np.asarray(m) - x64 * y64).max() < 1e-12 * np.abs(x64 * y64).max()


def test_df_stencil_matches_f64():
    mesh = create_mesh(12, 12)
    K_st, _ = compile_stencils(mesh)
    rng = np.random.default_rng(2)
    x64 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    y64 = apply_stencil(x64, K_st)
    ydf = df_to_f64(df_apply_stencil(df_from_f64(x64), np.asarray(K_st)))
    scale = float(jnp.abs(y64).max())
    assert float(jnp.abs(ydf - y64).max()) / scale < 1e-12


@pytest.mark.parametrize("dim", [2, 3])
def test_mixed_direct_matches_f64_direct(dim):
    if dim == 2:
        mesh = create_mesh(16, 16)
    else:
        mesh = create_cube_mesh(8, 8, 8, hexahedral=True)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, params)
    rng = np.random.default_rng(3)
    b1 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    b2 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    z1, z2 = MixedPrecisionDPPDirect(mesh, params).solve(b1, b2)
    r1, r2 = op.residual(z1, z2, b1, b2)
    rel = float(
        jnp.sqrt(jnp.vdot(r1, r1) + jnp.vdot(r2, r2)).real
        / jnp.sqrt(jnp.vdot(b1, b1) + jnp.vdot(b2, b2)).real
    )
    assert rel < 1e-12
    zr1, _ = FastDiagDPPSolver(mesh, params).solve(b1, b2)
    assert float(jnp.abs(z1 - zr1).max() / jnp.abs(zr1).max()) < 1e-11


def test_tpu_direct_preset_solves():
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.solvers.parameters import LINEAR_SOLVER_PARAMS, TPU_DIRECT_PARAMS
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    mesh = create_mesh(8, 8)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    sol = solve_dpp(W, params, bcs, solver_parameters=TPU_DIRECT_PARAMS)
    ref = solve_dpp(W, params, bcs, solver_parameters=LINEAR_SOLVER_PARAMS)
    assert sol.iteration_number == 1
    for a, b in zip(sol.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-10


def test_mixed_field_direct_matches_f64(monkeypatch):
    mesh = create_mesh(16, 16)
    params = DPPParameters()
    from perphil_tpu.ops.direct import FastDiagFieldSolver
    from perphil_tpu.ops.mixed import MixedPrecisionFieldDirect

    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.standard_normal(mesh.node_shape))
    fd = FastDiagFieldSolver(mesh, params.k1, params.beta, params.mu)
    mx = MixedPrecisionFieldDirect(mesh, params.k1, params.beta, params.mu)
    z64 = fd.solve(b)
    zmx = mx.solve(b)
    assert float(jnp.abs(zmx - z64).max() / jnp.abs(z64).max()) < 1e-10


def test_mixed_exact_mode_env(monkeypatch):
    """PERPHIL_TPU_EXACT_SOLVES=mixed swaps the fieldsplit block solver
    without changing outer iteration counts."""
    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.solvers import parameters as sp
    from perphil_tpu.solvers.solver import _build_linear_solver
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    mesh = create_mesh(16, 16)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    cfg = {**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS}
    ref = solve_dpp(W, params, bcs, solver_parameters=cfg)
    monkeypatch.setenv("PERPHIL_TPU_EXACT_SOLVES", "mixed")
    _build_linear_solver.cache_clear()
    mixed = solve_dpp(W, params, bcs, solver_parameters=cfg)
    _build_linear_solver.cache_clear()
    assert mixed.iteration_number == ref.iteration_number == 4
    for a, b in zip(mixed.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-7
