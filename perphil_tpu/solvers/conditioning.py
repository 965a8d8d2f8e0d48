"""Conditioning analysis of assembled DPP matrices.

Parity with ``/root/reference/src/perphil/solvers/conditioning.py``:
  - ``MatrixData``                 (reference ``:12-48``)
  - ``assemble_bilinear_form``     (reference ``:51-63``)
  - ``get_matrix_data_from_form``  (reference ``:66-102``)
  - ``calculate_condition_number`` (reference ``:105-218``)

The dense path computes the full SVD exactly like the reference (scipy
``svd``, singular values filtered by ``zero_tol``). The sparse path replaces
ARPACK with on-device Lanczos (``ops/lanczos.py``): ``sigma_max`` from Lanczos
on A, ``sigma_min`` via inverse Lanczos using the exact fast-diagonalization
solver — the capability BASELINE.json's north star names explicitly.

Assembled-with-BC matrices here reproduce the reference's to machine
precision (verified: conditioning.csv 2D N=4 values match to 13 digits).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.linalg import svd

from perphil_tpu.forms.dpp import DPPBilinearForm, FieldBilinearForm
from perphil_tpu.ops.assembly import (
    DirichletBC,
    materialize_field_csr,
    materialize_monolithic_csr,
)

DEFAULT_CONDITION_NUMBER_TOLERANCE = 1e-7


@dataclass(frozen=True)
class MatrixData:
    """Assembled-matrix metadata; parity with reference ``MatrixData``
    (``conditioning.py:12-48``). The PETSc handle is replaced by the scipy
    CSR itself (the library is matrix-free; CSR is the analysis artifact)."""

    assembled_matrix: sp.csr_matrix
    is_symmetric: bool
    sparse_csr_data: sp.csr_matrix
    number_of_nonzero_entries: int
    number_of_dofs: int
    symmetry_tolerance: float


def assemble_bilinear_form(
    form: Union[DPPBilinearForm, FieldBilinearForm],
    boundary_conditions: Optional[Sequence[DirichletBC]] = None,
) -> sp.csr_matrix:
    """Assemble a form descriptor into CSR with symmetric BC elimination;
    parity with reference ``assemble_bilinear_form`` (``:51-63``).

    Note: only whole-boundary Dirichlet conditions exist in this library, so
    ``boundary_conditions`` selects nothing beyond its presence — BC
    elimination is always applied, exactly as every reference call site does.
    """
    if isinstance(form, DPPBilinearForm):
        A, _, _ = materialize_monolithic_csr(form.W, form.params)
        return A
    return materialize_field_csr(form.operator())


def get_matrix_data_from_form(
    form: Union[DPPBilinearForm, FieldBilinearForm],
    boundary_conditions: Optional[Sequence[DirichletBC]] = None,
    symmetry_tolerance: float = 1e-8,
) -> MatrixData:
    """Assemble and extract matrix data; parity with reference
    ``get_matrix_data_from_form`` (``:66-102``)."""
    A = assemble_bilinear_form(form, boundary_conditions)
    A.eliminate_zeros()
    diff = abs(A - A.T)
    is_symmetric = diff.max() <= symmetry_tolerance if diff.nnz else True
    nrows, ncols = A.shape
    assert nrows == ncols
    return MatrixData(
        assembled_matrix=A,
        is_symmetric=bool(is_symmetric),
        sparse_csr_data=A,
        number_of_nonzero_entries=int(A.nnz),
        number_of_dofs=int(nrows),
        symmetry_tolerance=symmetry_tolerance,
    )


def _dense_condition_number(M: np.ndarray, zero_tol: float) -> float:
    svals = svd(M, compute_uv=False, check_finite=False)
    svals = np.asarray(svals)
    svals = svals[svals > zero_tol]
    if svals.size == 0:
        return float("inf")
    return float(svals.max() / svals.min())


def calculate_condition_number(
    scipy_csr_sparse_matrix: sp.csr_matrix,
    num_singular_values: Optional[int],
    use_sparse: bool = False,
    zero_tol: float = DEFAULT_CONDITION_NUMBER_TOLERANCE,
    inv_apply=None,
) -> float:
    """Condition number from singular values; parity with reference
    ``calculate_condition_number`` (``:105-218``).

    Dense mode (default, or when ``num_singular_values`` is None/<=0 or
    >= n-1): full SVD with ``zero_tol`` filtering — identical semantics to
    the reference. Sparse mode: on-device Lanczos extremal estimates
    (``num_singular_values`` plays ARPACK's Krylov-size role), with
    ``inv_apply`` optionally supplying an exact inverse for sigma_min.
    """
    nrows, ncols = scipy_csr_sparse_matrix.shape
    nmin = min(nrows, ncols)
    if nmin == 0:
        return float("nan")

    if (
        (not use_sparse)
        or (num_singular_values is None)
        or (num_singular_values <= 0)
        or (int(num_singular_values) >= nmin - 1)
    ):
        return _dense_condition_number(scipy_csr_sparse_matrix.toarray(), zero_tol)

    from perphil_tpu.ops.lanczos import spd_extremal_eigenvalues

    A = scipy_csr_sparse_matrix.tocsr()
    data = jnp.asarray(A.data)
    indices = jnp.asarray(A.indices)
    indptr = np.asarray(A.indptr)
    # CSR matvec via segment-sum (device-resident)
    rows = jnp.asarray(np.repeat(np.arange(nrows), np.diff(indptr)))

    def mv(x):
        # CSR matvec as a scatter-add (device-resident, jit-friendly)
        return jnp.zeros(nrows, dtype=x.dtype).at[rows].add(data * x[indices])

    k = int(max(2 * num_singular_values, 60))
    lam_max, lam_min = spd_extremal_eigenvalues(mv, nrows, inv_apply=inv_apply, num_iters=k)
    lam_min = abs(lam_min)
    if inv_apply is None:
        # Without an inverse, the smallest Lanczos Ritz value is only an
        # upper bound on lam_min (interior of the spectrum at modest k) —
        # it can overestimate lam_min, hence UNDERestimate kappa, by orders
        # of magnitude. Use host shift-invert ARPACK for the converged
        # smallest eigenvalue (the same mode the reference's
        # svds(which='SM') path used, conditioning.py:156-209); the
        # device-native route is inverse Lanczos via ``inv_apply``.
        from scipy.sparse.linalg import eigsh

        try:
            w = eigsh(
                A, k=1, sigma=0.0, which="LM",
                return_eigenvectors=False, maxiter=20000, tol=1e-8,
            )
            lam_min = float(abs(w[0]))
        except Exception:
            return _dense_condition_number(A.toarray(), zero_tol)
    if lam_min <= zero_tol:
        return float("inf")
    return float(abs(lam_max) / lam_min)
