"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the capability the reference never tests — SURVEY §4 calls for
device-count-gated sharding tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, DPPOperator
from perphil_tpu.parallel.sharding import (
    device_mesh,
    field_spec,
    shard_grid,
    shard_stacked,
    sharded_solve_dpp,
)
from perphil_tpu.solvers import parameters as sp
from perphil_tpu.solvers import solve_dpp
from perphil_tpu.utils.manufactured_solutions import exact_expressions

needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@needs_8
def test_device_mesh_axes():
    dm = device_mesh([4, 2])
    assert dm.axis_names == ("z", "y")
    assert dm.devices.shape == (4, 2)
    assert str(field_spec(dm, 3)) == str(jax.sharding.PartitionSpec(None, "z", "y", None))


@needs_8
def test_sharded_matvec_matches_single_device():
    mesh = create_mesh(15, 15)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, DPPParameters())
    mv = jax.jit(op.stacked_matvec())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2,) + mesh.node_shape))
    y_single = mv(x)
    dm = device_mesh([4], axis_names=("y",))
    xs = shard_stacked(x, dm)
    y_sharded = mv(xs)
    assert np.allclose(np.asarray(y_sharded), np.asarray(y_single), atol=1e-14)


@needs_8
@pytest.mark.parametrize(
    "params_dict",
    [sp.PLAIN_GMRES_PARAMS, {**sp.GMRES_PARAMS, **sp.FIELDSPLIT_LU_PARAMS}],
    ids=["plain-gmres", "fieldsplit-lu"],
)
def test_sharded_solve_matches_single_device_2d(params_dict):
    mesh = create_mesh(15, 15)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    ref = solve_dpp(W, params, bcs, solver_parameters=params_dict)
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    sol = sharded_solve_dpp(W, params, bcs, dm, solver_parameters=params_dict)
    assert sol.iteration_number == ref.iteration_number
    # Krylov solutions agree to the solver tolerance (cross-device psum
    # reduction order perturbs roundoff at the GMRES rtol level)
    for a, b in zip(sol.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-6


@needs_8
def test_sharded_3d_direct_solve():
    mesh = create_cube_mesh(7, 7, 7, hexahedral=True)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    ref = solve_dpp(W, params, bcs, solver_parameters=sp.LINEAR_SOLVER_PARAMS)
    dm = device_mesh([4, 2])  # ("z", "y")
    sol = sharded_solve_dpp(W, params, bcs, dm, solver_parameters=sp.LINEAR_SOLVER_PARAMS)
    for a, b in zip(sol.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-10


@pytest.mark.parametrize(
    "sp_dict",
    [
        {"ksp_type": "preonly", "pc_type": "lu"},
        {"ksp_type": "gmres", "pc_type": "fieldsplit", "ksp_rtol": 1e-8},
    ],
    ids=["direct", "fieldsplit"],
)
def test_degree2_sharded_padding_matches_single_device(sp_dict):
    """Degree-p DoF lattices (p*N+1 nodes, odd for even p) phantom-pad to
    divisibility like Q1 (identity 1D factor blocks, inert phantom dofs):
    the sharded solve matches the single-device one to solver tolerance
    and — for the iterative path — with the identical iteration count."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    mesh = create_mesh(8, 8)
    V2 = FunctionSpace(mesh, degree=2)
    W = mixed_space(V2)  # 17x17 DoF lattice: pads to 20x18 on a [4,2] mesh
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    ref = solve_dpp(W, params, bcs, solver_parameters=sp_dict)
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    sol = sharded_solve_dpp(W, params, bcs, dm, solver_parameters=sp_dict)
    assert sol.iteration_number == ref.iteration_number
    for a, b in zip(sol.solution.data, ref.solution.data):
        assert np.asarray(a).shape == np.asarray(b).shape  # cropped back
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-10


@pytest.mark.parametrize("pc", ["jacobi", "none"])
def test_p2_simplex_sharded_matches_single_device(pc):
    """P2 on simplex meshes shards through the boundary-mask phantom
    padding (P2SimplexDPPOperator.padding: phantom lattice rows are
    identity with zero data, so their residual is permanently zero):
    identical iteration counts and machine-precision agreement with the
    single-device solve."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    mesh = create_mesh(8, 8, quadrilateral=False)
    V2 = FunctionSpace(mesh, degree=2)
    W = mixed_space(V2)  # 17x17 refined lattice: pads to 20x18 on [4,2]
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    sp_dict = {"ksp_type": "gmres", "pc_type": pc, "ksp_rtol": 1e-8}
    ref = solve_dpp(W, params, bcs, solver_parameters=sp_dict)
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    sol = sharded_solve_dpp(W, params, bcs, dm, solver_parameters=sp_dict)
    assert sol.iteration_number == ref.iteration_number
    for a, b in zip(sol.solution.data, ref.solution.data):
        assert np.asarray(a).shape == np.asarray(b).shape  # cropped back
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-12


def test_p2_simplex_sharded_preonly_raises_clearly():
    """The P2 simplex direct path is host scipy splu — no SPMD
    partitioning. The sharded entry must say so instead of crashing in
    the tensor-product builder (the pre-round-4 behavior)."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC

    mesh = create_mesh(8, 8, quadrilateral=False)
    W = mixed_space(FunctionSpace(mesh, degree=2))
    bcs = [DirichletBC(W.sub(0), 1.0), DirichletBC(W.sub(1), 0.0)]
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    with pytest.raises(NotImplementedError, match="sharded P2 simplex"):
        sharded_solve_dpp(
            W, DPPParameters(), bcs, dm,
            solver_parameters={"ksp_type": "preonly", "pc_type": "lu"},
        )
    # a DIVISIBLE lattice (padding all zero on a degenerate 1x1 mesh) must
    # refuse too: the guard is on being sharded, not on being padded
    dm1 = device_mesh([1, 1], axis_names=("y", "x"))
    with pytest.raises(NotImplementedError, match="sharded P2 simplex"):
        sharded_solve_dpp(
            W, DPPParameters(), bcs, dm1,
            solver_parameters={"ksp_type": "preonly", "pc_type": "lu"},
        )


def test_p2_simplex_padded_operator_matches_unpadded():
    """Unit check at the ops level: the phantom-padded P2 operator agrees
    with the unpadded one on the real region for matvec and lifted RHS,
    and is exactly identity (with zero RHS) on the phantom region."""
    from perphil_tpu.forms.spaces import FunctionSpace
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.simplexfem import P2SimplexDPPOperator

    mesh = create_mesh(4, 4, quadrilateral=False)
    V2 = FunctionSpace(mesh, degree=2)
    shape = V2.dof_mesh.node_shape  # (9, 9)
    pad = (3, 1)
    params = DPPParameters()
    op0 = P2SimplexDPPOperator(mesh, params)
    opP = P2SimplexDPPOperator(mesh, params, pad)
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal(shape))
    z2 = jnp.asarray(rng.standard_normal(shape))
    pads = [(0, p) for p in pad]
    z1p, z2p = jnp.pad(z1, pads), jnp.pad(z2, pads)
    crop = tuple(slice(0, n) for n in shape)
    y1, y2 = op0.matvec(z1, z2)
    y1p, y2p = opP.matvec(z1p, z2p)
    np.testing.assert_allclose(np.asarray(y1p[crop]), np.asarray(y1), rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(y2p[crop]), np.asarray(y2), rtol=0, atol=1e-14)
    # phantom rows: identity on the input (which is zero-padded here) —
    # check BOTH fields on BOTH padded axes so an axis- or field-specific
    # padding regression can't slip through
    for yp in (y1p, y2p):
        assert not np.asarray(yp[shape[0]:, :]).any()
        assert not np.asarray(yp[:, shape[1]:]).any()
    b1, b2 = op0.lifted_rhs(z1, z2)
    b1p, b2p = opP.lifted_rhs(z1p, z2p)
    np.testing.assert_allclose(np.asarray(b1p[crop]), np.asarray(b1), rtol=0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(b2p[crop]), np.asarray(b2), rtol=0, atol=1e-14)
    for bp in (b1p, b2p):
        assert not np.asarray(bp[shape[0]:, :]).any()
        assert not np.asarray(bp[:, shape[1]:]).any()


@pytest.mark.slow
@needs_8
def test_sharded_gmres_ilu_matches_single_device():
    """GMRES + structured ILU(0) under GSPMD: the wavefront/scan-tree
    trisolves are the likeliest structure for a partitioner to mangle
    (sequential dependence along wavefronts), so pin sharded == unsharded
    at a padded size (15 -> phantom-padded to 16 nodes per axis)."""
    mesh = create_mesh(15, 15)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    ref = solve_dpp(W, params, bcs, solver_parameters=sp.GMRES_ILU_PARAMS)
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    sol = sharded_solve_dpp(W, params, bcs, dm, solver_parameters=sp.GMRES_ILU_PARAMS)
    assert sol.iteration_number == ref.iteration_number
    for a, b in zip(sol.solution.data, ref.solution.data):
        scale = np.abs(np.asarray(b)).max()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() / scale < 1e-6


@needs_8
def test_scaling_harness_smoke():
    """experiments/scaling.py end-to-end on the virtual mesh: correct row
    schema, iteration counts stable across device counts, CSV round-trip."""
    import csv as _csv

    from perphil_tpu.experiments.iterative_bench import Approach
    from perphil_tpu.experiments.scaling import run_scaling, save_scaling_csv

    rows = run_scaling(
        modes=("strong",),
        device_counts=(1, 4),
        base_n=12,
        dim=2,
        approaches=[Approach.SS_GMRES],
        repeats=1,
    )
    assert [r.devices for r in rows] == [1, 4]
    its = {r.iterations for r in rows}
    assert len(its) == 1, f"iteration count must not depend on sharding: {its}"
    # virtual mesh: speedup/efficiency are intentionally EMPTY (meaningless
    # on time-sliced host cores); the valid columns are halo/collective/
    # parity diagnostics
    assert rows[0].efficiency == "" and rows[1].speedup == ""
    assert rows[0].halo_bytes_per_exchange == 0  # single device: no halo
    assert rows[1].halo_bytes_per_exchange > 0
    assert rows[1].matvec_collectives.startswith("cp=")
    assert all(r.iteration_parity for r in rows)
    out = tmp = None
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/scaling.csv"
        save_scaling_csv(rows, out)
        with open(out) as f:
            got = list(_csv.DictReader(f))
    assert len(got) == 2 and got[0]["mode"] == "strong"


@needs_8
def test_sharded_ngs_picard_matches_single_device():
    """Picard NGS (the pinned-coloring multicolor secant sweeper) under
    GSPMD: colored masked sweeps + halo exchange must follow the exact
    single-device trajectory — identical Picard iteration count and
    machine-precision solution agreement on a device-divisible grid."""
    from perphil_tpu.parallel.sharding import sharded_solve_dpp_nonlinear
    from perphil_tpu.solvers import solve_dpp_nonlinear

    mesh = create_mesh(7, 7)  # 8x8 nodes: divisible by a [4, 2] mesh
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    ref = solve_dpp_nonlinear(W, params, bcs, sp.PICARD_LU_SOLVER_PARAMS)
    dm = device_mesh([4, 2], axis_names=("y", "x"))
    sol = sharded_solve_dpp_nonlinear(W, params, bcs, dm, sp.PICARD_LU_SOLVER_PARAMS)
    assert sol.iteration_number == ref.iteration_number
    for a, b in zip(sol.solution.data, ref.solution.data):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-11)


@needs_8
def test_sharded_ngs_refuses_nondivisible_grid():
    mesh = create_mesh(8, 8)  # 9x9 nodes: NOT divisible by [4, 2]
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    bcs = [DirichletBC(W.sub(0), 1.0), DirichletBC(W.sub(1), 0.0)]
    from perphil_tpu.parallel.sharding import sharded_solve_dpp_nonlinear

    dm = device_mesh([4, 2], axis_names=("y", "x"))
    with pytest.raises(NotImplementedError, match="device-divisible"):
        sharded_solve_dpp_nonlinear(
            W, DPPParameters(), bcs, dm, sp.PICARD_LU_SOLVER_PARAMS
        )
