"""Fast-diagonalization direct solver tests: exactness against sparse LU."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import (
    FieldOperator,
    materialize_field_csr,
    materialize_monolithic_csr,
)
from perphil_tpu.ops.direct import FastDiagDPPSolver, FastDiagFieldSolver


def test_field_solver_exact_2d():
    mesh = create_mesh(5, 4)
    params = DPPParameters()
    fop = FieldOperator(
        create_function_spaces(mesh)[1], params.k1, params.beta, params.mu
    )
    A = materialize_field_csr(fop)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(mesh.num_vertices)
    fd = FastDiagFieldSolver(mesh, params.k1, params.beta, params.mu)
    z = np.asarray(fd.solve(jnp.asarray(b.reshape(mesh.node_shape)))).ravel()
    z_ref = spla.spsolve(A.tocsc(), b)
    assert np.abs(z - z_ref).max() < 1e-11


def test_monolithic_solver_exact_2d():
    mesh = create_mesh(4, 4)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    A, n0, _ = materialize_monolithic_csr(W, params)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(2 * n0)
    fd = FastDiagDPPSolver(mesh, params)
    z1, z2 = fd.solve(
        jnp.asarray(b[:n0].reshape(mesh.node_shape)),
        jnp.asarray(b[n0:].reshape(mesh.node_shape)),
    )
    z = np.concatenate([np.asarray(z1).ravel(), np.asarray(z2).ravel()])
    z_ref = spla.spsolve(A.tocsc(), b)
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < 1e-12


def test_monolithic_solver_exact_3d_hex():
    mesh = create_cube_mesh(3, 3, 3, hexahedral=True)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    A, n0, _ = materialize_monolithic_csr(W, params)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(2 * n0)
    fd = FastDiagDPPSolver(mesh, params)
    z1, z2 = fd.solve(
        jnp.asarray(b[:n0].reshape(mesh.node_shape)),
        jnp.asarray(b[n0:].reshape(mesh.node_shape)),
    )
    z = np.concatenate([np.asarray(z1).ravel(), np.asarray(z2).ravel()])
    z_ref = spla.spsolve(A.tocsc(), b)
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < 1e-12


def test_lumped_proxy_preconditions_triangles():
    """On triangle meshes the lumped fast-diag proxy must be spectrally close
    enough that preconditioned CG converges fast."""
    from perphil_tpu.ops.krylov import cg

    mesh = create_mesh(8, 8, quadrilateral=False)
    params = DPPParameters()
    fop = FieldOperator(
        create_function_spaces(mesh)[1], params.k1, params.beta, params.mu
    )
    pc = FastDiagFieldSolver(mesh, params.k1, params.beta, params.mu, lumped=True)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(mesh.node_shape))
    x, its, _ = cg(fop.matvec, b, rtol=1e-12, max_it=200, M_inv=pc.solve)
    assert int(its) < 40
    A = materialize_field_csr(fop)
    z_ref = spla.spsolve(A.tocsc(), np.asarray(b).ravel())
    assert np.abs(np.asarray(x).ravel() - z_ref).max() / np.abs(z_ref).max() < 1e-9
