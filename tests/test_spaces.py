"""Function space tests (mirrors reference
``forms/_tests/test_spaces.py:11-18``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import (
    Function,
    FunctionSpace,
    MixedFunctionSpace,
    create_function_spaces,
    mixed_space,
)
from perphil_tpu.mesh import create_mesh


def test_create_function_spaces_quad_and_tri():
    for quad in (True, False):
        mesh = create_mesh(2, 2, quadrilateral=quad)
        U, V = create_function_spaces(mesh)
        assert U.value_shape == (2,)
        assert V.value_shape == ()
        assert V.dim() == 9
        assert U.dim() == 18


def test_unsupported_degree():
    # simplex meshes support P1/P2 (ops/simplexfem); degree > 2 has no
    # half-lattice structure there. Tensor-product meshes take any degree
    # (Qp via ops/tensorfem); degree < 1 is always rejected.
    tri = create_mesh(2, 2, quadrilateral=False)
    V2t = FunctionSpace(tri, degree=2)
    assert V2t.dim() == 25  # P2 DoFs == once-refined lattice
    with pytest.raises(ValueError):
        FunctionSpace(tri, degree=3)
    quad = create_mesh(2, 2)
    with pytest.raises(ValueError):
        FunctionSpace(quad, degree=0)
    V2 = FunctionSpace(quad, degree=2)
    assert V2.dim() == 25  # (2*2+1)^2 nodes on the refined lattice


def test_mixed_space():
    mesh = create_mesh(2, 2)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    assert W.num_sub_spaces() == 2
    assert W.dim() == 18
    assert W.sub(1).index == 1


def test_function_interpolate_and_at():
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    f = Function(V).interpolate(lambda x, y: x + 2 * y)
    assert f.data.shape == mesh.node_shape
    assert np.allclose(float(f.at((0.5, 0.25))), 1.0)
    # linear functions are reproduced exactly by bilinear interpolation
    pts = np.array([[0.3, 0.7], [0.125, 0.5]])
    assert np.allclose(np.asarray(f.at(pts)), pts[:, 0] + 2 * pts[:, 1])


def test_function_split_and_dat():
    mesh = create_mesh(2, 2)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    w = Function(W)
    p1, p2 = w.split()
    assert p1.data.shape == mesh.node_shape
    assert w.dat.shape == (18,)
