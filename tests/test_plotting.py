"""Plotting smoke tests (mirrors reference utils/plotting.py coverage)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from perphil_tpu.forms import Function, create_function_spaces
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.utils.plotting import plot_2d_mesh, plot_scalar_field, plot_vector_field


def test_plot_scalar_field():
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x * y)
    ax = plot_scalar_field(f, title="p")
    assert ax.get_title() == "p"


def test_plot_vector_field():
    mesh = create_mesh(4, 4)
    U, _ = create_function_spaces(mesh)
    u = Function(U).interpolate(lambda x, y: (y, -x))
    ax = plot_vector_field(u, stride=2)
    assert ax is not None


def test_plot_mesh_quad_and_tri():
    for quad in (True, False):
        mesh = create_mesh(3, 3, quadrilateral=quad)
        ax = plot_2d_mesh(mesh, title="mesh")
        assert ax.get_title() == "mesh"


def test_plot_3d_rejected():
    mesh = create_cube_mesh(2, 2, 2)
    with pytest.raises(ValueError):
        plot_2d_mesh(mesh)
