"""Mesh tests (mirrors reference ``mesh/_tests/test_mesh.py:10-20``)."""

import numpy as np
import pytest

from perphil_tpu.mesh import StructuredMesh, create_cube_mesh, create_mesh


def test_create_mesh_quad():
    mesh = create_mesh(2, 3)
    assert mesh.element == "quad"
    assert mesh.dim == 2
    assert mesh.node_shape == (4, 3)  # (ny+1, nx+1)
    assert mesh.num_vertices == 12
    assert mesh.num_cells == 6
    assert mesh.h == (0.5, 1.0 / 3.0)


def test_create_mesh_triangle():
    mesh = create_mesh(2, 2, quadrilateral=False)
    assert mesh.element == "triangle"
    assert mesh.num_cells == 8  # 2 triangles per square
    assert not mesh.is_tensor_product


def test_create_cube_mesh():
    tet = create_cube_mesh(2, 2, 2)
    assert tet.element == "tet" and tet.num_cells == 48
    hexm = create_cube_mesh(2, 2, 2, hexahedral=True)
    assert hexm.element == "hex" and hexm.num_cells == 8
    assert hexm.node_shape == (3, 3, 3)


def test_coordinates_and_boundary():
    mesh = create_mesh(4, 4)
    X, Y = mesh.coordinates()
    assert X.shape == mesh.node_shape
    # grid convention: u[j, i] with x varying along the last axis
    assert np.allclose(X[0], np.linspace(0, 1, 5))
    assert np.allclose(Y[:, 0], np.linspace(0, 1, 5))
    bd = mesh.boundary_mask()
    assert bd.sum() == 16  # perimeter nodes of a 5x5 grid
    assert mesh.interior_mask().sum() == 9


def test_invalid_meshes():
    with pytest.raises(ValueError):
        StructuredMesh(cells=(2, 2, 2), element="quad")
    with pytest.raises(ValueError):
        StructuredMesh(cells=(0, 2), element="quad")
    with pytest.raises(ValueError):
        StructuredMesh(cells=(2, 2), element="pentagon")
