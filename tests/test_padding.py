"""Phantom-padding tests: padded operators/solvers must reproduce the
unpadded results exactly, and sharded solves must work for arbitrary
(non-divisible) mesh sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, DPPOperator
from perphil_tpu.parallel.sharding import device_mesh, mesh_padding, sharded_solve_dpp
from perphil_tpu.solvers import parameters as sp
from perphil_tpu.solvers import solve_dpp
from perphil_tpu.solvers.solver import _build_linear_solver, _freeze
from perphil_tpu.utils.manufactured_solutions import exact_expressions

needs_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _problem(N=16):
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    return mesh, W, params, bcs


def test_padded_operator_matches_unpadded():
    mesh, W, params, _ = _problem(6)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    x2 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    y1, y2 = DPPOperator(W, params).matvec(x1, x2)
    pad = (3, 5)
    pads = [(0, p) for p in pad]
    opp = DPPOperator(W, params, pad)
    y1p, y2p = opp.matvec(jnp.pad(x1, pads), jnp.pad(x2, pads))
    crop = tuple(slice(0, n) for n in mesh.node_shape)
    assert np.allclose(np.asarray(y1p[crop]), np.asarray(y1), atol=1e-14)
    # phantom region behaves as identity rows on zero data
    assert np.allclose(np.asarray(y1p)[mesh.node_shape[0]:, :], 0.0)


@pytest.mark.parametrize(
    "cfg",
    [sp.LINEAR_SOLVER_PARAMS, sp.PLAIN_GMRES_PARAMS,
     {**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS},
     pytest.param(sp.GMRES_ILU_PARAMS, marks=pytest.mark.slow)],
    ids=["direct", "gmres", "fieldsplit", "ilu"],
)
def test_padded_solver_matches_unpadded(cfg):
    mesh, W, params, bcs = _problem(9)
    ref = solve_dpp(W, params, bcs, solver_parameters=cfg)
    from perphil_tpu.ops.assembly import bc_values_per_field

    g1, g2 = bc_values_per_field(W, bcs)
    pad = (2, 6)
    pads = [(0, p) for p in pad]
    solver = _build_linear_solver(W, params, _freeze(cfg), pad)
    z1, z2, its, rnorm = solver(jnp.pad(g1, pads), jnp.pad(g2, pads))
    assert int(its) == ref.iteration_number
    crop = tuple(slice(0, n) for n in mesh.node_shape)
    for zp, zr in zip((z1, z2), ref.solution.data):
        scale = np.abs(np.asarray(zr)).max()
        assert np.abs(np.asarray(zp[crop]) - np.asarray(zr)).max() / scale < 1e-9


@needs_8
def test_sharded_solve_arbitrary_size():
    # N=16 -> 17 nodes per axis, indivisible by any mesh axis: exercises
    # automatic phantom padding in the sharded path
    mesh, W, params, bcs = _problem(16)
    ref = solve_dpp(
        W, params, bcs, solver_parameters={**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS}
    )
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    assert mesh_padding(mesh.node_shape, dm) == (3, 1)
    sol = sharded_solve_dpp(
        W, params, bcs, dm,
        solver_parameters={**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS},
    )
    assert sol.iteration_number == ref.iteration_number
    for a, b in zip(sol.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-8


def test_padded_mixed_direct_matches():
    mesh, W, params, bcs = _problem(9)
    from perphil_tpu.solvers.parameters import TPU_DIRECT_PARAMS

    ref = solve_dpp(W, params, bcs, solver_parameters=TPU_DIRECT_PARAMS)
    from perphil_tpu.ops.assembly import bc_values_per_field

    g1, g2 = bc_values_per_field(W, bcs)
    pad = (2, 6)
    pads = [(0, p) for p in pad]
    solver = _build_linear_solver(W, params, _freeze(TPU_DIRECT_PARAMS), pad)
    z1, z2, its, _ = solver(jnp.pad(g1, pads), jnp.pad(g2, pads))
    crop = tuple(slice(0, n) for n in mesh.node_shape)
    for zp, zr in zip((z1, z2), ref.solution.data):
        scale = np.abs(np.asarray(zr)).max()
        assert np.abs(np.asarray(zp[crop]) - np.asarray(zr)).max() / scale < 1e-9


@pytest.mark.parametrize("block_pc", ["jacobi", "ilu"])
def test_padded_fieldsplit_block_pcs(block_pc):
    """Fieldsplit with jacobi/ilu block PCs must work (and match the
    unpadded result) under phantom padding — the sharded-path default."""
    mesh, W, params, bcs = _problem(9)
    cfg = {
        **sp.GMRES_PARAMS,
        "pc_type": "fieldsplit",
        "pc_fieldsplit_type": "multiplicative",
        "fieldsplit_0": {"ksp_type": "preonly", "pc_type": block_pc},
        "fieldsplit_1": {"ksp_type": "preonly", "pc_type": block_pc},
    }
    ref = solve_dpp(W, params, bcs, solver_parameters=cfg)
    from perphil_tpu.ops.assembly import bc_values_per_field

    g1, g2 = bc_values_per_field(W, bcs)
    pad = (2, 6)
    pads = [(0, p) for p in pad]
    solver = _build_linear_solver(W, params, _freeze(cfg), pad)
    z1, z2, its, _ = solver(jnp.pad(g1, pads), jnp.pad(g2, pads))
    assert int(its) == ref.iteration_number
    crop = tuple(slice(0, n) for n in mesh.node_shape)
    for zp, zr in zip((z1, z2), ref.solution.data):
        scale = np.abs(np.asarray(zr)).max()
        assert np.abs(np.asarray(zp[crop]) - np.asarray(zr)).max() / scale < 1e-8


def test_public_initial_guess_option_is_noop():
    """PETSc's ksp_initial_guess_nonzero is accepted (no-op: our default
    already starts from the BC-lift guess, like Firedrake)."""
    mesh, W, params, bcs = _problem(8)
    ref = solve_dpp(W, params, bcs, solver_parameters=sp.PLAIN_GMRES_PARAMS)
    got = solve_dpp(
        W, params, bcs,
        solver_parameters={**sp.PLAIN_GMRES_PARAMS, "ksp_initial_guess_nonzero": True},
    )
    assert got.iteration_number == ref.iteration_number
