"""P2 on simplex meshes (``ops/simplexfem``): parity-class stencil operator,
assembly agreement, solver dispatch, and the O(h^3) L2 convergence order.

The reference reaches degree>1 through Firedrake
(``/root/reference/src/perphil/forms/spaces.py:5-36``); no published
artifact uses it, so correctness is pinned structurally: matvec ==
assembled CSR at machine precision, and textbook convergence orders.
"""

import numpy as np
import pytest

from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
from perphil_tpu.mesh.structured import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC
from perphil_tpu.ops.simplexfem import (
    P2SimplexDPPOperator,
    assemble_p2_monolithic,
    p2_simplex_matrices,
)
from perphil_tpu.solvers import solve_dpp
from perphil_tpu.utils.manufactured_solutions import (
    exact_expressions,
    exact_expressions_3d,
)
from perphil_tpu.utils.postprocessing import h1_seminorm_error, l2_error

PARAMS = DPPParameters()


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_element_matrices_consistency(dim):
    """Mass rows sum to |T| (partition of unity); stiffness rows sum to 0
    (constants in the kernel); both matrices symmetric."""
    from perphil_tpu.ops.element import cell_subcells

    h = (0.25,) * dim
    element = "triangle" if dim == 2 else "tet"
    for verts, _, _ in cell_subcells(element, h):
        nodes, K, M = p2_simplex_matrices(verts, h)
        assert np.abs(K - K.T).max() < 1e-14
        assert np.abs(M - M.T).max() < 1e-14
        assert np.abs(K.sum(axis=1)).max() < 1e-12
        phys = verts.astype(float) * np.asarray(h)
        E = (phys[1:] - phys[0]).T
        import math

        vol = abs(np.linalg.det(E)) / math.factorial(dim)
        assert abs(M.sum() - vol) < 1e-12


@pytest.mark.parametrize(
    "maker,args",
    [
        (create_mesh, (4, 3)),
        (create_cube_mesh, (3, 2, 2)),
    ],
    ids=["tri", "tet"],
)
def test_p2_matvec_matches_assembled_csr(maker, args):
    kwargs = {"quadrilateral": False} if len(args) == 2 else {"hexahedral": False}
    mesh = maker(*args, **kwargs)
    op = P2SimplexDPPOperator(mesh, PARAMS)
    A = assemble_p2_monolithic(mesh, PARAMS)
    import jax.numpy as jnp

    shape = op.dof_shape
    n = int(np.prod(shape))
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2 * n)
    y1, y2 = op.matvec(
        jnp.asarray(x[:n].reshape(shape)), jnp.asarray(x[n:].reshape(shape))
    )
    y = np.concatenate([np.asarray(y1).ravel(), np.asarray(y2).ravel()])
    yref = A @ x
    assert np.abs(y - yref).max() / np.abs(yref).max() < 1e-13


def test_p2_2d_convergence_order():
    """L2 error contracts ~8x per refinement (order 3); H1 ~4x (order 2)."""
    errs, herrs = [], []
    for N in (4, 8, 16):
        mesh = create_mesh(N, N, quadrilateral=False)
        W = mixed_space(FunctionSpace(mesh, degree=2))
        _, p1e, _, p2e = exact_expressions(mesh, PARAMS)
        bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
        sol = solve_dpp(
            W, PARAMS, bcs,
            solver_parameters={"ksp_type": "preonly", "pc_type": "lu"},
        )
        assert sol.iteration_number == 1
        p1h, _ = sol.solution.split()
        errs.append(l2_error(p1h, p1e))
        herrs.append(h1_seminorm_error(p1h, p1e))
    # pre-asymptotic at N=4 (measured 6.2), asymptotic by N=8->16 (7.4)
    assert errs[0] / errs[1] > 5.0
    assert 6.5 < errs[1] / errs[2] < 9.5
    assert 3.0 < herrs[1] / herrs[2] < 5.0


@pytest.mark.slow
def test_p2_3d_direct_and_gmres_agree():
    mesh = create_cube_mesh(3, 3, 3, hexahedral=False)
    W = mixed_space(FunctionSpace(mesh, degree=2))
    _, p1e, _, p2e = exact_expressions_3d(mesh, PARAMS)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    d = solve_dpp(
        W, PARAMS, bcs, solver_parameters={"ksp_type": "preonly", "pc_type": "lu"}
    )
    g = solve_dpp(
        W, PARAMS, bcs,
        solver_parameters={
            "ksp_type": "gmres", "pc_type": "jacobi", "ksp_rtol": 1e-10,
        },
    )
    assert g.iteration_number > 1
    a = np.asarray(g.solution.split()[0].dat)
    b = np.asarray(d.solution.split()[0].dat)
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-7


def test_p2_dof_count_is_refined_lattice():
    """P2 DoFs on Kuhn meshes = (2N+1)^d: vertices + one midpoint per edge
    of the triangulation (axis edges + face diagonals + body diagonals)."""
    mesh = create_cube_mesh(3, 2, 4, hexahedral=False)
    V2 = FunctionSpace(mesh, degree=2)
    assert V2.dim() == 7 * 5 * 9


def test_degree3_simplex_rejected():
    mesh = create_mesh(4, 4, quadrilateral=False)
    with pytest.raises(ValueError, match="[Dd]egree"):
        FunctionSpace(mesh, degree=3)


def test_dof_mesh_matches_function_space():
    # the P2 lattice convention must agree with the general degree-p one in
    # forms/spaces.FunctionSpace.dof_mesh (p2_dof_mesh exists only so ops
    # does not import forms)
    from perphil_tpu.forms.spaces import FunctionSpace
    from perphil_tpu.ops.simplexfem import p2_dof_mesh

    for mesh in (create_mesh(3, 4, quadrilateral=False),
                 create_cube_mesh(2, 3, 2, hexahedral=False)):
        assert p2_dof_mesh(mesh) == FunctionSpace(mesh, degree=2).dof_mesh
