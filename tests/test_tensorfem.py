"""Degree-p tensor-product spaces: operator correctness against dense kron
assembly, exact direct solves, degree-1 equivalence with the stencil path,
and Qp convergence orders."""

import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.mesh.structured import create_mesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops.tensorfem import (
    TensorDPPOperator,
    TensorFastDiagDPP,
    assemble_1d,
    errornorm_p,
    lagrange_ref_matrices,
)


def test_reference_matrices_q1():
    Khat, Mhat = lagrange_ref_matrices(1)
    assert np.allclose(Khat, [[1, -1], [-1, 1]])
    assert np.allclose(Mhat, np.array([[2, 1], [1, 2]]) / 6.0)


def test_reference_matrices_partition_of_unity():
    for p in (2, 3, 4):
        Khat, Mhat = lagrange_ref_matrices(p)
        # rows of K sum to zero (constants in the kernel); M sums to |e| = 1
        assert np.allclose(Khat.sum(axis=1), 0.0, atol=1e-12)
        assert np.allclose(Mhat.sum(), 1.0, atol=1e-12)


@pytest.mark.parametrize("p", [1, 2, 3])
def test_matvec_matches_dense_kron(p):
    """The tensor-product matvec equals the dense kron-assembled monolithic
    matrix with symmetric BC elimination."""
    N = 3
    mesh = create_mesh(N, N)
    params = DPPParameters()
    op = TensorDPPOperator(mesh, params, degree=p)
    Kx, Mx = assemble_1d(p, N, mesh.h[0])
    Ky, My = assemble_1d(p, N, mesh.h[1])
    K2 = np.kron(Ky, Mx) + np.kron(My, Kx)  # slowest-first (y outer)
    M2 = np.kron(My, Mx)
    pr = params
    S1 = (pr.k1 / pr.mu) * K2 + (pr.beta / pr.mu) * M2
    S2 = (pr.k2 / pr.mu) * K2 + (pr.beta / pr.mu) * M2
    C = -(pr.beta / pr.mu) * M2
    A = np.block([[S1, C], [C, S2]])
    n = K2.shape[0]
    bdry = np.asarray(op.boundary_mask).ravel()
    bd2 = np.concatenate([bdry, bdry])
    A[bd2] = 0.0
    A[:, bd2] = 0.0
    A[np.where(bd2)[0], np.where(bd2)[0]] = 1.0

    rng = np.random.default_rng(0)
    x = rng.standard_normal(2 * n)
    shape = op.dof_shape
    y1, y2 = op.matvec(
        jnp.asarray(x[:n].reshape(shape)), jnp.asarray(x[n:].reshape(shape))
    )
    y_tensor = np.concatenate([np.asarray(y1).ravel(), np.asarray(y2).ravel()])
    y_dense = A @ x
    assert np.abs(y_tensor - y_dense).max() < 1e-11 * np.abs(y_dense).max()


@pytest.mark.parametrize("p", [1, 2, 3])
def test_direct_solve_exact(p):
    N = 4
    mesh = create_mesh(N, N)
    params = DPPParameters()
    op = TensorDPPOperator(mesh, params, degree=p)
    solver = TensorFastDiagDPP(mesh, params, degree=p)
    shape = op.dof_shape
    rng = np.random.default_rng(1)
    bdry = jnp.asarray(op.boundary_mask)
    g1 = jnp.asarray(rng.standard_normal(shape))
    g2 = jnp.asarray(rng.standard_normal(shape))
    b1, b2 = op.lifted_rhs(g1, g2)
    z1, z2 = solver.solve(b1, b2)
    r1, r2 = op.residual(z1, z2, b1, b2)
    rel = float(
        jnp.sqrt(jnp.vdot(r1, r1) + jnp.vdot(r2, r2))
        / jnp.sqrt(jnp.vdot(b1, b1) + jnp.vdot(b2, b2))
    )
    assert rel < 1e-12
    # boundary rows pass through
    assert np.allclose(np.asarray(z1)[np.asarray(op.boundary_mask)],
                       np.asarray(g1)[np.asarray(op.boundary_mask)])


def test_degree1_matches_stencil_operator():
    from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
    from perphil_tpu.ops.assembly import DPPOperator

    N = 5
    mesh = create_mesh(N, N)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op_st = DPPOperator(W, params)
    op_tp = TensorDPPOperator(mesh, params, degree=1)
    rng = np.random.default_rng(2)
    z1 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    z2 = jnp.asarray(rng.standard_normal(mesh.node_shape))
    y1s, y2s = op_st.matvec(z1, z2)
    y1t, y2t = op_tp.matvec(z1, z2)
    assert float(jnp.abs(y1s - y1t).max()) < 1e-11 * float(jnp.abs(y1s).max())
    assert float(jnp.abs(y2s - y2t).max()) < 1e-11 * float(jnp.abs(y2s).max())


@pytest.mark.parametrize("p,l2_order,h1_order", [(2, 3.0, 2.0), (3, 4.0, 3.0)])
def test_qp_convergence_orders(p, l2_order, h1_order):
    """Manufactured smooth solution: Qp interpolation converges at p+1 in
    L2 and p in H1-seminorm; the solved DPP field tracks it."""
    params = DPPParameters()

    def exact(x, y):
        return jnp.sin(jnp.pi * x) * jnp.cos(jnp.pi * y) + x * y

    errs_l2, errs_h1, hs = [], [], []
    for N in (4, 8):
        mesh = create_mesh(N, N)
        shape = tuple(p * c + 1 for c in reversed(mesh.cells))
        ys = np.linspace(0, 1, shape[0])
        xs = np.linspace(0, 1, shape[1])
        X, Y = np.meshgrid(xs, ys, indexing="xy")
        u = exact(jnp.asarray(X), jnp.asarray(Y))
        errs_l2.append(errornorm_p(u, exact, mesh, p, "l2"))
        errs_h1.append(errornorm_p(u, exact, mesh, p, "h1s"))
        hs.append(mesh.hmax())
    eoc_l2 = np.log(errs_l2[0] / errs_l2[1]) / np.log(hs[0] / hs[1])
    eoc_h1 = np.log(errs_h1[0] / errs_h1[1]) / np.log(hs[0] / hs[1])
    assert abs(eoc_l2 - (p + 1)) < 0.35
    assert abs(eoc_h1 - p) < 0.35


@pytest.mark.parametrize("sp_name", ["direct", "fieldsplit"])
def test_q2_solve_dpp_end_to_end(sp_name):
    """Full user-facing flow at degree 2: solve_dpp on Q2 spaces converges
    at order 3 in L2 (manufactured solution), and the fieldsplit-LU
    signature (4 GMRES iterations, reference conditioning study invariant)
    survives the degree change."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.solvers.parameters import LINEAR_SOLVER_PARAMS
    from perphil_tpu.utils.manufactured_solutions import exact_expressions
    from perphil_tpu.utils.postprocessing import l2_error

    if sp_name == "direct":
        sp = LINEAR_SOLVER_PARAMS
    else:
        sp = {
            "ksp_type": "gmres",
            "ksp_rtol": 1e-8,
            "pc_type": "fieldsplit",
            "pc_fieldsplit_type": "multiplicative",
        }
    params = DPPParameters()
    errs, hs, its = [], [], []
    for N in (4, 8):
        mesh = create_mesh(N, N)
        V2 = FunctionSpace(mesh, degree=2)
        W = mixed_space(V2)
        _, p1e, _, p2e = exact_expressions(mesh, params)
        bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
        sol = solve_dpp(W, params, bcs, solver_parameters=sp)
        p1h, _ = sol.solution.split()
        errs.append(l2_error(p1h, p1e))
        hs.append(mesh.hmax())
        its.append(sol.iteration_number)
    eoc = np.log(errs[0] / errs[1]) / np.log(hs[0] / hs[1])
    assert eoc > 2.5, (errs, eoc)
    if sp_name == "fieldsplit":
        assert its == [4, 4], its
    else:
        assert its == [1, 1], its


def test_q2_gmres_jacobi_matches_direct():
    """Degree-2 GMRES+Jacobi converges to the fast-diag direct answer
    (validates the tensor-product diagonal construction end to end)."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.utils.manufactured_solutions import exact_expressions
    from perphil_tpu.utils.postprocessing import l2_error

    params = DPPParameters()
    mesh = create_mesh(8, 8)
    V2 = FunctionSpace(mesh, degree=2)
    W = mixed_space(V2)
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    s = solve_dpp(
        W, params, bcs,
        solver_parameters={"ksp_type": "gmres", "ksp_rtol": 1e-10,
                           "ksp_max_it": 5000, "pc_type": "jacobi"},
    )
    sd = solve_dpp(
        W, params, bcs,
        solver_parameters={"ksp_type": "preonly", "pc_type": "lu"},
    )
    p1h, _ = s.solution.split()
    p1d, _ = sd.solution.split()
    e, ed = l2_error(p1h, p1e), l2_error(p1d, p1e)
    assert abs(e - ed) < 1e-6 * ed
    assert s.iteration_number < 200  # jacobi must actually precondition


def test_q2_3d_hex_solve():
    """Degree-2 on 3D hex meshes: the Kronecker machinery is
    dimension-generic. Exact direct solve + higher order than Q1 at the
    same sizes (both pre-asymptotic on the boundary-layer MMS)."""
    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.mesh.structured import create_cube_mesh
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d
    from perphil_tpu.utils.postprocessing import l2_error

    params = DPPParameters()
    errs = {}
    for deg in (1, 2):
        errs[deg] = []
        for N in (2, 4):
            mesh = create_cube_mesh(N, N, N, hexahedral=True)
            V = FunctionSpace(mesh, degree=deg)
            W = mixed_space(V)
            _, p1e, _, p2e = exact_expressions_3d(mesh, params)
            bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
            s = solve_dpp(
                W, params, bcs,
                solver_parameters={"ksp_type": "preonly", "pc_type": "lu"},
            )
            assert s.iteration_number == 1
            p1h, _ = s.solution.split()
            errs[deg].append(l2_error(p1h, p1e))
    # Q2 beats Q1 at every size and converges faster
    assert errs[2][0] < errs[1][0] and errs[2][1] < errs[1][1]
    assert errs[2][0] / errs[2][1] > errs[1][0] / errs[1][1]


def test_errornorm_p_function_valued_exact():
    """Degree>1 error norms accept a same-space Function as the exact field
    (the reference-vs-refined comparison the Q1 paths support)."""
    import numpy as np

    from perphil_tpu.forms.spaces import Function, FunctionSpace
    from perphil_tpu.mesh.structured import create_mesh
    from perphil_tpu.utils.postprocessing import h1_seminorm_error, l2_error

    mesh = create_mesh(8, 8)
    V = FunctionSpace(mesh, degree=2)
    xs = np.linspace(0.0, 1.0, 2 * 8 + 1)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    vals = np.sin(np.pi * X) * np.cos(np.pi * Y)
    u = Function(V)
    u.data = jnp.asarray(vals)
    v = Function(V)
    v.data = jnp.asarray(vals * 1.001)
    e = l2_error(u, v)
    assert 0.0 < e < 1e-2
    eh = h1_seminorm_error(u, v)
    assert 0.0 < eh < 1e-1
    # self-comparison is exactly zero
    assert l2_error(u, u) == 0.0

    # mesh/degree mismatch is rejected with a clear error
    W = FunctionSpace(create_mesh(4, 4), degree=2)
    w = Function(W)
    with pytest.raises(TypeError):
        l2_error(u, w)
