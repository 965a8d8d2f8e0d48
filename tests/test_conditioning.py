"""Conditioning tests (mirrors reference
``solvers/_tests/test_conditioning.py:8-56``) plus golden-number parity with
the reference conditioning CSVs."""

import numpy as np
import pytest
import scipy.sparse as sp

from perphil_tpu.forms import create_function_spaces, dpp_form, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.solvers.conditioning import (
    MatrixData,
    calculate_condition_number,
    get_matrix_data_from_form,
)
from perphil_tpu.experiments.iterative_bench import estimate_condition_numbers


def test_dense_vs_sparse_on_handbuilt_spd():
    # mirrors reference test_conditioning.py:8-14: 2x2 SPD CSR
    A = sp.csr_matrix(np.array([[4.0, 1.0], [1.0, 3.0]]))
    dense = calculate_condition_number(A, num_singular_values=None, use_sparse=False)
    ev = np.linalg.eigvalsh(A.toarray())
    assert abs(dense - ev[-1] / ev[0]) < 1e-12


def test_matrix_data_structure():
    mesh = create_mesh(2, 2)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    a, _ = dpp_form(W, DPPParameters())
    md = get_matrix_data_from_form(a, [])
    assert isinstance(md, MatrixData)
    assert md.number_of_dofs == W.dim()
    assert md.is_symmetric
    assert md.number_of_nonzero_entries > 0
    assert md.sparse_csr_data.shape == (18, 18)


# reference: results-conforming-2d/conditioning/conditioning.csv
_COND_2D = {
    4: (81.91800877610804, 3.357638888888892, 24.368707087045706),
    8: (223.31832152613455, 12.227926665771225, 56.14918002821589),
    16: (893.0186669800956, 49.24488971944212, 216.4484381208243),
}


@pytest.mark.regression
@pytest.mark.parametrize("N", [4, 8, 16])
@pytest.mark.parametrize("use_sparse", [False, True], ids=["dense-svd", "lanczos"])
def test_condition_numbers_match_reference_2d(N, use_sparse):
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    conds = estimate_condition_numbers(
        W, num_of_factors=50 if use_sparse else None, use_sparse=use_sparse
    )
    rm, rma, rmi = _COND_2D[N]
    assert abs(conds["monolithic"] - rm) / rm < 1e-8
    assert abs(conds["macro"] - rma) / rma < 1e-8
    assert abs(conds["micro"] - rmi) / rmi < 1e-8


@pytest.mark.regression
def test_condition_numbers_match_reference_3d_hex():
    # reference: results-conforming-3d/conditioning/conditioning_3d.csv N=4
    mesh = create_cube_mesh(4, 4, 4, hexahedral=True)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    conds = estimate_condition_numbers(W, num_of_factors=None, use_sparse=False)
    assert abs(conds["monolithic"] - 166.58) / 166.58 < 1e-3
    assert abs(conds["macro"] - 2.708) / 2.708 < 1e-3
    assert abs(conds["micro"] - 166.48) / 166.48 < 1e-3


def test_sparse_conditioning_simplicial_matches_dense():
    """PCG-based inverse Lanczos on triangle meshes must agree with dense SVD."""
    mesh = create_mesh(8, 8, quadrilateral=False)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    dense = estimate_condition_numbers(W, num_of_factors=None, use_sparse=False)
    sparse = estimate_condition_numbers(W, num_of_factors=50, use_sparse=True)
    for key in ("monolithic", "macro", "micro"):
        assert abs(sparse[key] - dense[key]) / dense[key] < 1e-6


def test_sparse_mode_without_inverse_matches_dense():
    """use_sparse with no inv_apply must still converge the smallest
    eigenvalue (host shift-invert fallback), not report the interior
    smallest Ritz value (which silently underestimates kappa)."""
    from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
    from perphil_tpu.mesh.structured import create_mesh
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.assembly import materialize_monolithic_csr
    from perphil_tpu.solvers.conditioning import calculate_condition_number

    mesh = create_mesh(16, 16)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    A, _, _ = materialize_monolithic_csr(W, DPPParameters())
    dense = calculate_condition_number(A, None, use_sparse=False)
    sparse = calculate_condition_number(A, 5, use_sparse=True)
    assert abs(sparse - dense) / dense < 1e-6


def test_csr_materialization_rejects_degree_p():
    """Degree>1 spaces must be rejected by the Q1 CSR path, not silently
    assembled as the wrong (Q1) matrix."""
    import pytest

    from perphil_tpu.forms.spaces import FunctionSpace, mixed_space
    from perphil_tpu.mesh.structured import create_mesh
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.ops.assembly import materialize_monolithic_csr

    mesh = create_mesh(4, 4)
    W2 = mixed_space(FunctionSpace(mesh, degree=2))
    with pytest.raises(NotImplementedError, match="Q1"):
        materialize_monolithic_csr(W2, DPPParameters())
