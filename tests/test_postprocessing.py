"""Postprocessing tests: error norms, slicing, velocity projection
(mirrors reference ``utils/_tests`` coverage)."""

import jax.numpy as jnp
import numpy as np

from perphil_tpu.forms import Function, create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.utils.postprocessing import (
    calculate_darcy_velocity_from_pressure,
    h1_seminorm_error,
    l2_error,
    slice_along_x,
    split_dpp_solution,
)


def test_l2_error_exact_polynomial():
    # p_h = x + 2y is in the FE space: error against its own expression is 0
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x + 2 * y)
    assert l2_error(f, lambda x, y: x + 2 * y) < 1e-13
    assert h1_seminorm_error(f, lambda x, y: x + 2 * y) < 1e-12


def test_l2_error_known_value():
    # f_h = 0, exact = 1 -> ||error||_L2 = 1 on the unit square
    mesh = create_mesh(3, 5)
    _, V = create_function_spaces(mesh)
    f = Function(V)
    assert abs(l2_error(f, lambda x, y: 1.0 + 0 * x) - 1.0) < 1e-13


def test_l2_error_triangles():
    mesh = create_mesh(4, 4, quadrilateral=False)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x * 0.0)
    assert abs(l2_error(f, lambda x, y: 1.0 + 0 * x) - 1.0) < 1e-12
    g = Function(V).interpolate(lambda x, y: x + y)
    assert l2_error(g, lambda x, y: x + y) < 1e-13


def test_h1_error_against_function():
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x)
    g = Function(V).interpolate(lambda x, y: 2 * x)
    # |f - g|_H1 = ||d/dx (x - 2x)|| = 1
    assert abs(h1_seminorm_error(f, g) - 1.0) < 1e-12


def test_split_dpp_solution():
    mesh = create_mesh(2, 2)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    w = Function(W)
    p1, p2 = split_dpp_solution(w)
    assert p1.name == "p1_h" and p2.name == "p2_h"


def test_slice_along_x():
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: y)
    y_pts, vals = slice_along_x(f, 0.5)
    assert np.allclose(y_pts, np.linspace(0, 1, 5))
    assert np.allclose(vals, y_pts)


def test_darcy_velocity_projection():
    # p = x -> u = -k grad p = (-k, 0) exactly representable
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    p = Function(V).interpolate(lambda x, y: x)
    u = calculate_darcy_velocity_from_pressure(p, conductivity=2.0)
    assert np.allclose(np.asarray(u.data[..., 0]), -2.0, atol=1e-10)
    assert np.allclose(np.asarray(u.data[..., 1]), 0.0, atol=1e-10)
