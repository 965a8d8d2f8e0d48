"""DPP form tests (mirrors reference ``forms/_tests/test_dpp.py:12-40`` plus
structural checks of the stencil lowering against dense element assembly)."""

import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, dpp_form, dpp_splitted_form, mixed_space
from perphil_tpu.forms.dpp import dpp_delayed_form
from perphil_tpu.forms.spaces import Function
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DPPOperator, materialize_monolithic_csr


def _small_setup(N=3, quad=True):
    mesh = create_mesh(N, N, quadrilateral=quad)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    return mesh, V, W, DPPParameters()


def test_dpp_form_requires_mixed_space():
    mesh, V, W, params = _small_setup()
    with pytest.raises(ValueError):
        dpp_form(V, params)
    with pytest.raises(ValueError):
        dpp_splitted_form(V, params)


def test_dpp_form_structure():
    mesh, V, W, params = _small_setup()
    a, L = dpp_form(W, params)
    assert a.W is W and a.params is params
    op = a.operator()
    assert isinstance(op, DPPOperator)


def test_matvec_matches_csr():
    for quad in (True, False):
        mesh, V, W, params = _small_setup(N=3, quad=quad)
        op = DPPOperator(W, params)
        A, n0, n1 = materialize_monolithic_csr(W, params)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(n0 + n1)
        shape = mesh.node_shape
        y1, y2 = op.matvec(
            jnp.asarray(x[:n0].reshape(shape)), jnp.asarray(x[n0:].reshape(shape))
        )
        y = np.concatenate([np.asarray(y1).ravel(), np.asarray(y2).ravel()])
        assert np.allclose(y, A @ x, atol=1e-12)


def test_monolithic_matrix_symmetric():
    mesh, V, W, params = _small_setup()
    A, _, _ = materialize_monolithic_csr(W, params)
    assert abs(A - A.T).max() < 1e-14


def test_lifted_rhs_consistency():
    """A z = b must hold for z = exact discrete solution of a known system:
    check that boundary rows pass through and interior rows see the lift."""
    mesh, V, W, params = _small_setup()
    op = DPPOperator(W, params)
    g1 = jnp.asarray(np.random.default_rng(1).standard_normal(mesh.node_shape))
    g2 = jnp.asarray(np.random.default_rng(2).standard_normal(mesh.node_shape))
    b1, b2 = op.lifted_rhs(g1, g2)
    bd = mesh.boundary_mask()
    assert np.allclose(np.asarray(b1)[bd], np.asarray(g1)[bd])
    # solving and applying must round-trip: A z = b with z_bd = g
    A, n0, n1 = materialize_monolithic_csr(W, params)
    b = np.concatenate([np.asarray(b1).ravel(), np.asarray(b2).ravel()])
    import scipy.sparse.linalg as spla

    z = spla.spsolve(A.tocsc(), b)
    zb = np.concatenate([np.asarray(g1).ravel(), np.asarray(g2).ravel()])
    bd2 = np.concatenate([bd.ravel(), bd.ravel()])
    assert np.allclose(z[bd2], zb[bd2])


def test_delayed_form_parts():
    mesh, V, W, params = _small_setup()
    p2_0 = Function(V).interpolate(lambda x, y: x * y)
    p1_0 = Function(V)
    (a_mac, L_mac), (a_mic, L_mic) = dpp_delayed_form(V, V, params, p1_0, p2_0)
    assert a_mac.k == params.k1 and a_mic.k == params.k2
    rhs = L_mac.assemble()
    assert rhs.shape == mesh.node_shape
    # lagged RHS is (beta/mu) M p2_0: zero iff p2_0 is zero
    assert float(jnp.abs(L_mic.assemble()).max()) == 0.0


def test_splitted_residual_zero_at_solution():
    mesh, V, W, params = _small_setup()
    F, fields = dpp_splitted_form(W, params)
    op = F.operator()
    g = jnp.zeros(mesh.node_shape)
    b1, b2 = op.lifted_rhs(g, g)
    r1, r2 = F(g, g, b1, b2)
    assert float(jnp.abs(r1).max()) < 1e-14
    assert float(jnp.abs(r2).max()) < 1e-14
