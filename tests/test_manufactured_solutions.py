"""Manufactured solution tests (mirrors reference
``utils/_tests/test_manufactured_solutions.py:13-30``), plus an analytic
verification that the MMS solves the homogeneous DPP system."""

import jax
import jax.numpy as jnp
import numpy as np

from perphil_tpu.forms import create_function_spaces
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.utils.manufactured_solutions import (
    exact_expressions,
    exact_expressions_3d,
    interpolate_exact,
)


def test_interpolate_exact_shapes():
    mesh = create_mesh(2, 2)
    params = DPPParameters()
    U, V = create_function_spaces(mesh)
    u1, p1, u2, p2 = interpolate_exact(mesh, U, V, params)
    assert p1.data.shape == mesh.node_shape
    assert u1.data.shape == mesh.node_shape + (2,)
    assert np.isfinite(np.asarray(p2.data)).all()


def test_velocity_is_darcy_of_pressure_2d():
    mesh = create_mesh(2, 2)
    params = DPPParameters(k1=2.0, k2=0.3, beta=1.5, mu=1.2)
    u1e, p1e, u2e, p2e = exact_expressions(mesh, params)
    pts = [(0.3, 0.4), (0.7, 0.9)]
    for (x, y) in pts:
        for (ue, pe, k) in ((u1e, p1e, params.k1), (u2e, p2e, params.k2)):
            gx, gy = jax.grad(pe, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
            ux, uy = ue(jnp.asarray(x), jnp.asarray(y))
            assert abs(float(ux) - float(-(k / params.mu) * gx)) < 1e-8
            assert abs(float(uy) - float(-(k / params.mu) * gy)) < 1e-8


def _pde_residual_2d(pe_pair, params, x, y):
    """Strong-form residuals of the two coupled Darcy equations."""
    p1e, p2e = pe_pair

    def lap(f):
        dxx = jax.grad(jax.grad(f, argnums=0), argnums=0)(x, y)
        dyy = jax.grad(jax.grad(f, argnums=1), argnums=1)(x, y)
        return dxx + dyy

    xi = -(params.beta / params.mu) * (p1e(x, y) - p2e(x, y))
    r1 = -(params.k1 / params.mu) * lap(p1e) - xi
    r2 = -(params.k2 / params.mu) * lap(p2e) + xi
    return float(r1), float(r2)


def test_mms_solves_homogeneous_dpp_2d():
    mesh = create_mesh(2, 2)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    x, y = jnp.asarray(0.37), jnp.asarray(0.61)
    r1, r2 = _pde_residual_2d((p1e, p2e), params, x, y)
    scale = abs(float(p2e(x, y))) + 1.0
    assert abs(r1) / scale < 1e-9
    assert abs(r2) / scale < 1e-9


def test_mms_solves_homogeneous_dpp_3d():
    mesh = create_cube_mesh(2, 2, 2)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    x, y, z = (jnp.asarray(v) for v in (0.3, 0.45, 0.7))

    def lap(f):
        out = 0.0
        for ax in range(3):
            out = out + jax.grad(jax.grad(f, argnums=ax), argnums=ax)(x, y, z)
        return out

    xi = -(params.beta / params.mu) * (p1e(x, y, z) - p2e(x, y, z))
    r1 = -(params.k1 / params.mu) * lap(p1e) - xi
    r2 = -(params.k2 / params.mu) * lap(p2e) + xi
    scale = abs(float(p2e(x, y, z))) + 1.0
    assert abs(float(r1)) / scale < 1e-9
    assert abs(float(r2)) / scale < 1e-9
