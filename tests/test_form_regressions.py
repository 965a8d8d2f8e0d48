"""Form-structure regression (mirrors reference
``forms/_tests/test_dpp_regressions.py:13-26``, which pins rank=2,
integral count=4, test rank=2 for the monolithic form). Our lowered
representation pins the equivalent structural facts: block structure,
stencil footprints, and weight identities."""

import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, dpp_form, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.stencil import compile_stencils

pytestmark = pytest.mark.regression


def test_dpp_form_structure_regression():
    mesh = create_mesh(2, 2)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    a, L = dpp_form(W, DPPParameters())
    # rank 2 (bilinear), 2x2 block structure, zero forcing
    assert a.W.num_sub_spaces() == 2
    assert type(L).__name__ == "ZeroLinearForm"
    # the four weak-form integrals lower to two reusable stencils
    K_st, M_st = compile_stencils(mesh)
    assert K_st.shape == (3, 3) and M_st.shape == (3, 3)


_EXPECTED_STENCILS = {
    # (element, property): value — golden numbers derived from closed-form
    # Q1/P1 element matrices (these pin the assembly conventions)
    ("quad", "K_center"): 8.0 / 3.0,
    ("quad", "K_edge"): -1.0 / 3.0,
    ("quad", "K_rowsum"): 0.0,
    ("triangle", "K_center"): 4.0,
    ("triangle", "K_nonzeros"): 5,
    ("hex", "K_rowsum"): 0.0,
    ("tet", "K_nonzeros"): 7,  # Kuhn P1 stiffness = 7-point FD Laplacian
}


def test_stencil_weight_regressions():
    h = 0.5  # N=2 unit meshes
    quad = create_mesh(2, 2)
    K, M = compile_stencils(quad)
    assert abs(K[1, 1] - _EXPECTED_STENCILS[("quad", "K_center")]) < 1e-14
    assert abs(K[0, 1] - _EXPECTED_STENCILS[("quad", "K_edge")]) < 1e-14
    assert abs(float(np.sum(K)) - 0.0) < 1e-13  # constants in the kernel
    assert abs(float(np.sum(M)) - h * h) < 1e-14  # mass rowsum = cell area

    tri = create_mesh(2, 2, quadrilateral=False)
    Kt, Mt = compile_stencils(tri)
    assert abs(Kt[1, 1] - _EXPECTED_STENCILS[("triangle", "K_center")]) < 1e-14
    assert np.count_nonzero(Kt) == _EXPECTED_STENCILS[("triangle", "K_nonzeros")]
    assert abs(float(np.sum(Mt)) - h * h) < 1e-14

    hexm = create_cube_mesh(2, 2, 2, hexahedral=True)
    Kh, Mh = compile_stencils(hexm)
    assert abs(float(np.sum(Kh))) < 1e-13
    assert abs(float(np.sum(Mh)) - h**3) < 1e-14

    tet = create_cube_mesh(2, 2, 2)
    Ktet, Mtet = compile_stencils(tet)
    assert np.count_nonzero(np.abs(Ktet) > 1e-14) == _EXPECTED_STENCILS[("tet", "K_nonzeros")]
    assert abs(float(np.sum(Mtet)) - h**3) < 1e-14
