"""Post-processing: field splitting, Darcy velocity, slices, error norms.

Parity with ``/root/reference/src/perphil/utils/postprocessing.py``:
  - ``split_dpp_solution``                   (reference ``:6-31``)
  - ``calculate_darcy_velocity_from_pressure`` (reference ``:34-63``)
  - ``slice_along_x``                        (reference ``:66-86``)
  - ``l2_error``                             (reference ``:89-105``)
  - ``h1_seminorm_error``                    (reference ``:108-124``)

Error norms integrate with per-cell Gauss quadrature at UFL's estimated
degree (12) by default, so values match the reference CSVs; see
``perphil_tpu.utils.quadrature``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from perphil_tpu.forms.spaces import Function, FunctionSpace
from perphil_tpu.mesh.structured import StructuredMesh
from perphil_tpu.utils.quadrature import (
    DEFAULT_QUADRATURE_DEGREE,
    QPoint,
    cell_quadrature,
)


def split_dpp_solution(dpp_solution: Function) -> Tuple[Function, Function]:
    """Extract (p1_h, p2_h) from a mixed solution; reference ``:6-31``."""
    W = dpp_solution.function_space()
    if not hasattr(W, "num_sub_spaces") or W.num_sub_spaces() != 2:
        raise ValueError(f"Expected a 2-field MixedFunctionSpace, got {type(W)}")
    p1 = dpp_solution.sub(0)
    p2 = dpp_solution.sub(1)
    p1.name, p2.name = "p1_h", "p2_h"
    return p1, p2


# ---------------------------------------------------------------------------
# quadrature-point evaluation helpers
# ---------------------------------------------------------------------------


def _cells_grid_shape(mesh: StructuredMesh) -> Tuple[int, ...]:
    return tuple(reversed(mesh.cells))


def _fe_value_at(data: jnp.ndarray, mesh: StructuredMesh, qp: QPoint) -> jnp.ndarray:
    """FE function value at one quadrature point of every cell (cell grid).

    ``qp.stride`` steps the node lattice per grid cell (1 for degree-1 data
    on the vertex grid, 2 for P2 data on the refined lattice)."""
    cshape = _cells_grid_shape(mesh)
    s = qp.stride
    val = None
    for off, b in zip(qp.vertex_offsets, qp.basis):
        sl = tuple(
            slice(o, o + s * (c - 1) + 1, s) for o, c in zip(reversed(off), cshape)
        )
        term = b * data[sl]
        val = term if val is None else val + term
    return val


def _fe_grad_at(
    data: jnp.ndarray, mesh: StructuredMesh, qp: QPoint
) -> Tuple[jnp.ndarray, ...]:
    """FE gradient (coordinate-ordered components) at one qp of every cell."""
    cshape = _cells_grid_shape(mesh)
    d = mesh.dim
    s = qp.stride
    comps = [None] * d
    for off, g in zip(qp.vertex_offsets, qp.basis_grad):
        sl = tuple(
            slice(o, o + s * (c - 1) + 1, s) for o, c in zip(reversed(off), cshape)
        )
        patch = data[sl]
        for ax in range(d):
            if g[ax] == 0.0:
                continue
            term = g[ax] * patch
            comps[ax] = term if comps[ax] is None else comps[ax] + term
    return tuple(c if c is not None else jnp.zeros(cshape) for c in comps)


def _cell_origin_coords(mesh: StructuredMesh) -> Tuple[jnp.ndarray, ...]:
    coords = mesh.coordinates()
    sl = tuple(slice(0, -1) for _ in range(mesh.dim))
    return tuple(jnp.asarray(c[sl]) for c in coords)


def _exact_at(exact, mesh: StructuredMesh, qp: QPoint, origins) -> jnp.ndarray:
    if isinstance(exact, Function):
        return _fe_value_at(exact.data, mesh, qp)
    pts = [o + p for o, p in zip(origins, qp.point)]
    return exact(*pts)


def _exact_grad_at(exact, mesh: StructuredMesh, qp: QPoint, origins):
    if isinstance(exact, Function):
        return _fe_grad_at(exact.data, mesh, qp)
    pts = [(o + p).ravel() for o, p in zip(origins, qp.point)]
    d = mesh.dim
    grads = jax.vmap(jax.grad(exact, argnums=tuple(range(d))))(*pts)
    cshape = _cells_grid_shape(mesh)
    return tuple(g.reshape(cshape) for g in grads)


# ---------------------------------------------------------------------------
# error norms
# ---------------------------------------------------------------------------


def _quadrature_for(space, quadrature_degree: int):
    """QPoint table matching the space's degree: P2-simplex tables for
    degree-2 simplex spaces, the degree-1 vertex tables otherwise (Qp
    tensor spaces never reach here — they use ``errornorm_p``)."""
    mesh = space.mesh
    if space.degree == 2 and not mesh.is_tensor_product:
        from perphil_tpu.utils.quadrature import cell_quadrature_p2

        return cell_quadrature_p2(mesh, quadrature_degree)
    if space.degree > 1:
        raise NotImplementedError(
            f"error norms for degree-{space.degree} simplex spaces"
        )
    return cell_quadrature(mesh, quadrature_degree)


def l2_error(
    numerical: Function,
    exact_expr: Any,
    quadrature_degree: int = DEFAULT_QUADRATURE_DEGREE,
) -> float:
    """||numerical - exact||_{L2}; reference ``postprocessing.py:89-105``."""
    mesh = numerical.space.mesh
    if numerical.space.degree > 1 and mesh.is_tensor_product:
        from perphil_tpu.ops.tensorfem import errornorm_p

        return errornorm_p(
            numerical.data, exact_expr, mesh,
            numerical.space.degree, "l2", quadrature_degree,
        )
    origins = _cell_origin_coords(mesh)
    total = 0.0
    for qp in _quadrature_for(numerical.space, quadrature_degree):
        diff = _fe_value_at(numerical.data, mesh, qp) - _exact_at(
            exact_expr, mesh, qp, origins
        )
        total = total + qp.weight * jnp.sum(diff * diff)
    return float(jnp.sqrt(total))


def h1_seminorm_error(
    numerical: Function,
    exact_expr: Any,
    quadrature_degree: int = DEFAULT_QUADRATURE_DEGREE,
) -> float:
    """|numerical - exact|_{H1}; reference ``postprocessing.py:108-124``."""
    mesh = numerical.space.mesh
    if numerical.space.degree > 1 and mesh.is_tensor_product:
        from perphil_tpu.ops.tensorfem import errornorm_p

        return errornorm_p(
            numerical.data, exact_expr, mesh,
            numerical.space.degree, "h1s", quadrature_degree,
        )
    origins = _cell_origin_coords(mesh)
    total = 0.0
    for qp in _quadrature_for(numerical.space, quadrature_degree):
        fe = _fe_grad_at(numerical.data, mesh, qp)
        ex = _exact_grad_at(exact_expr, mesh, qp, origins)
        for a, b in zip(fe, ex):
            diff = a - b
            total = total + qp.weight * jnp.sum(diff * diff)
    return float(jnp.sqrt(total))


# ---------------------------------------------------------------------------
# Darcy velocity projection and line sampling
# ---------------------------------------------------------------------------


def calculate_darcy_velocity_from_pressure(
    pressure_field: Function,
    conductivity: float,
    velocity_space: Optional[FunctionSpace] = None,
    degree: int = 1,
) -> Function:
    """L2-project ``u = -k grad(p_h)`` into a CG1 vector space; parity with
    ``fd.project`` usage at reference ``postprocessing.py:34-63``.

    The projection solves the consistent-mass system ``M u_c = r_c`` per
    component with Jacobi-preconditioned CG (mass matrices are uniformly
    well-conditioned, so a handful of iterations reaches machine precision).
    """
    from perphil_tpu.ops.krylov import cg
    from perphil_tpu.ops.assembly import FullMassOperator

    mesh = pressure_field.space.mesh
    if velocity_space is None:
        velocity_space = FunctionSpace(mesh, degree=degree, value_shape=(mesh.dim,))
    d = mesh.dim
    origins = _cell_origin_coords(mesh)

    # RHS: r_v = sum_qp w * (-k dp/dx_c) * phi_v, scattered to vertices.
    rhs = [jnp.zeros(mesh.node_shape) for _ in range(d)]
    cshape = _cells_grid_shape(mesh)
    for qp in cell_quadrature(mesh, degree=4):
        g = _fe_grad_at(pressure_field.data, mesh, qp)
        for off, b in zip(qp.vertex_offsets, qp.basis):
            sl = tuple(slice(o, o + c) for o, c in zip(reversed(off), cshape))
            for ax in range(d):
                rhs[ax] = rhs[ax].at[sl].add(qp.weight * b * (-conductivity) * g[ax])

    M = FullMassOperator(mesh)
    dinv = 1.0 / M.diagonal()
    comps = []
    for ax in range(d):
        x, _, _ = cg(
            M.matvec, rhs[ax], rtol=1e-13, atol=0.0, max_it=200, M_inv=lambda r: dinv * r
        )
        comps.append(x)
    data = jnp.stack(comps, axis=-1)
    return Function(velocity_space, data)


def slice_along_x(
    scalar_field: Function, x_value: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample a 2D scalar field along the vertical line x = const; parity
    with reference ``postprocessing.py:66-86``."""
    mesh = scalar_field.space.mesh
    _, Y = (np.asarray(c) for c in mesh.coordinates())
    y_points = np.unique(Y)
    pts = np.stack([np.full_like(y_points, x_value), y_points], axis=1)
    values = np.asarray(scalar_field.at(pts))
    return y_points, values
