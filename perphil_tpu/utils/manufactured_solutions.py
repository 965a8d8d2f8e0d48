"""Manufactured (exact) solutions for the DPP model, 2D and 3D.

Parity with ``/root/reference/src/perphil/utils/manufactured_solutions.py``:

  - ``exact_expressions``     (reference ``:7-53``): 2D (u1, p1, u2, p2).
  - ``exact_expressions_3d``  (reference ``:56-94``): 3D, paper Eq. (6.3)
    "corrected so p2 uses k2".
  - ``interpolate_exact``     (reference ``:97-135``).

The reference returns UFL expressions; here each "expression" is a plain
JAX-traceable callable of coordinate arrays — evaluable at vertices
(interpolation / Dirichlet data) or at quadrature points (error norms), and
differentiable with ``jax.grad`` for H1-seminorm errors.

Both pressure fields solve the homogeneous DPP system exactly:
    p1 = (mu/pi) e^{pi x} sin(pi y) - (mu/(beta k1)) e^{eta y}
    p2 = (mu/pi) e^{pi x} sin(pi y) + (mu/(beta k2)) e^{eta y}
with eta = sqrt(beta (k1+k2)/(k1 k2)) and Darcy velocities
u_i = -(k_i/mu) grad p_i.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax.numpy as jnp

from perphil_tpu.forms.spaces import Function, FunctionSpace
from perphil_tpu.mesh.structured import StructuredMesh
from perphil_tpu.models.dpp.parameters import DPPParameters

PI = math.pi

ScalarExpr = Callable[..., jnp.ndarray]
VectorExpr = Callable[..., Tuple[jnp.ndarray, ...]]


def exact_expressions(
    mesh: StructuredMesh, dpp_params: DPPParameters
) -> Tuple[VectorExpr, ScalarExpr, VectorExpr, ScalarExpr]:
    """2D exact (u1, p1, u2, p2) callables; reference ``:7-53``."""
    k1, k2 = dpp_params.k1, dpp_params.k2
    beta, mu = dpp_params.beta, dpp_params.mu
    eta = dpp_params.eta

    def p1(x, y):
        return (mu / PI) * jnp.exp(PI * x) * jnp.sin(PI * y) - (mu / (beta * k1)) * jnp.exp(eta * y)

    def p2(x, y):
        return (mu / PI) * jnp.exp(PI * x) * jnp.sin(PI * y) + (mu / (beta * k2)) * jnp.exp(eta * y)

    def u1(x, y):
        e = jnp.exp(PI * x)
        return (
            -k1 * (e * jnp.sin(PI * y)),
            -k1 * (e * jnp.cos(PI * y) - (eta / (beta * k1)) * jnp.exp(eta * y)),
        )

    def u2(x, y):
        e = jnp.exp(PI * x)
        return (
            -k2 * (e * jnp.sin(PI * y)),
            -k2 * (e * jnp.cos(PI * y) + (eta / (beta * k2)) * jnp.exp(eta * y)),
        )

    return u1, p1, u2, p2


def exact_expressions_3d(
    mesh: StructuredMesh, dpp_params: DPPParameters
) -> Tuple[VectorExpr, ScalarExpr, VectorExpr, ScalarExpr]:
    """3D exact (u1, p1, u2, p2) callables; reference ``:56-94``.

    p_i(x,y,z) = (mu/pi) e^{pi x}(sin(pi y) + sin(pi z))
                 -/+ (mu/(beta k_i)) (e^{eta y} + e^{eta z})
    with velocities from Darcy's law u_i = -(k_i/mu) grad p_i.
    """
    k1, k2 = dpp_params.k1, dpp_params.k2
    beta, mu = dpp_params.beta, dpp_params.mu
    eta = dpp_params.eta

    def p1(x, y, z):
        s = jnp.sin(PI * y) + jnp.sin(PI * z)
        return (mu / PI) * jnp.exp(PI * x) * s - (mu / (beta * k1)) * (
            jnp.exp(eta * y) + jnp.exp(eta * z)
        )

    def p2(x, y, z):
        s = jnp.sin(PI * y) + jnp.sin(PI * z)
        return (mu / PI) * jnp.exp(PI * x) * s + (mu / (beta * k2)) * (
            jnp.exp(eta * y) + jnp.exp(eta * z)
        )

    def _vel(p, k):
        def u(x, y, z):
            e = jnp.exp(PI * x)
            s = jnp.sin(PI * y) + jnp.sin(PI * z)
            sign = -1.0 if p is p1 else 1.0
            # grad p, written out (avoids per-point autodiff at interpolation)
            dpx = mu * e * s
            dpy = mu * e * jnp.cos(PI * y) + sign * (mu * eta / (beta * k)) * jnp.exp(eta * y)
            dpz = mu * e * jnp.cos(PI * z) + sign * (mu * eta / (beta * k)) * jnp.exp(eta * z)
            return (-(k / mu) * dpx, -(k / mu) * dpy, -(k / mu) * dpz)

        return u

    return _vel(p1, k1), p1, _vel(p2, k2), p2


def interpolate_exact(
    mesh: StructuredMesh,
    velocity_space: FunctionSpace,
    pressure_space: FunctionSpace,
    dpp_params: DPPParameters,
) -> Tuple[Function, Function, Function, Function]:
    """Interpolate the 2D exact expressions into Functions; reference
    ``:97-135``."""
    u1_e, p1_e, u2_e, p2_e = exact_expressions(mesh, dpp_params)
    u1 = Function(velocity_space, name="u1_exact").interpolate(u1_e)
    p1 = Function(pressure_space, name="p1_exact").interpolate(p1_e)
    u2 = Function(velocity_space, name="u2_exact").interpolate(u2_e)
    p2 = Function(pressure_space, name="p2_exact").interpolate(p2_e)
    return u1, p1, u2, p2
