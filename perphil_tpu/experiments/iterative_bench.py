"""Benchmarking utilities for iterative and direct DPP solvers.

Parity with ``/root/reference/src/perphil/experiments/iterative_bench.py``:
  - ``Approach`` enum (6 strategies)      (reference ``:31-48``)
  - ``SolveResult``                       (reference ``:51-76``)
  - mesh/space/BC/parameter builders      (reference ``:79-131``)
  - ``make_fieldsplit_params_with``       (reference ``:134-154``)
  - ``params_for``                        (reference ``:157-188``)
  - ``solve_on_mesh``                     (reference ``:191-252``)
  - ``assemble_monolithic_matrix``        (reference ``:255-287``)
  - ``estimate_condition_numbers``        (reference ``:290-337``)
  - ``l2_errors_against_reference``       (reference ``:340-362``)
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from perphil_tpu.forms.dpp import dpp_form
from perphil_tpu.forms.spaces import (
    Function,
    FunctionSpace,
    MixedFunctionSpace,
    create_function_spaces,
    mixed_space,
)
from perphil_tpu.mesh.structured import StructuredMesh, create_mesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, materialize_monolithic_csr
from perphil_tpu.solvers import parameters as solver_params
from perphil_tpu.solvers import conditioning
from perphil_tpu.solvers.solver import solve_dpp, solve_dpp_nonlinear
from perphil_tpu.utils.postprocessing import l2_error


class Approach(str, Enum):
    """Solver approaches for the DPP model (reference ``:31-48``).

    Labels are kept identical to the reference so CSV artifacts diff
    cleanly ("MUMPS" names the direct-solver role, played here by the exact
    fast-diagonalization solver).
    """

    PLAIN_GMRES = "GMRES"
    GMRES_ILU = "GMRES + ILU PC"
    SS_GMRES = "Scale-Splitting GMRES"
    SS_GMRES_ILU = "Scale-Splitting GMRES + ILU PC"
    PICARD_MUMPS = "Scaling-Splitting Picard with MUMPS"
    MONOLITHIC_MUMPS = "Monolithic LU with MUMPS"


@dataclass(frozen=True)
class SolveResult:
    """Solve metadata (reference ``:51-76``)."""

    approach: Approach
    nx: int
    ny: int
    iteration_number: int
    residual_error: float
    fields: Optional[Tuple[Function, Function]] = None


def build_mesh(nx: int, ny: int, quadrilateral: bool = True) -> StructuredMesh:
    """Reference ``:79-96``."""
    return create_mesh(nx, ny, quadrilateral=quadrilateral)


def build_spaces(
    mesh: StructuredMesh,
) -> Tuple[FunctionSpace, FunctionSpace, MixedFunctionSpace]:
    """Reference ``:99-110``: (velocity, pressure, mixed) spaces."""
    U, V = create_function_spaces(mesh)
    W = mixed_space(V)
    return U, V, W


def default_bcs(W: MixedFunctionSpace) -> List[DirichletBC]:
    """Homogeneous Dirichlet BCs on both fields (reference ``:113-124``)."""
    return [DirichletBC(W.sub(0), 0.0), DirichletBC(W.sub(1), 0.0)]


def default_model_params() -> DPPParameters:
    """Reference ``:127-131``: k1=beta=mu=1, k2=1e-2."""
    return DPPParameters(k1=1.0, k2=1.0 / 1e2, beta=1.0, mu=1.0)


def make_fieldsplit_params_with(block_pc: str = "lu") -> Dict:
    """Fieldsplit GMRES config with selectable block PC (reference
    ``:134-154``)."""
    base = dict(solver_params.FIELDSPLIT_LU_PARAMS)
    base["ksp_type"] = "gmres"
    if block_pc.lower() != "lu":
        base["fieldsplit_0_pc_type"] = block_pc
        base["fieldsplit_1_pc_type"] = block_pc
        base["fieldsplit_0_ksp_type"] = base.get("fieldsplit_0_ksp_type", "preonly")
        base["fieldsplit_1_ksp_type"] = base.get("fieldsplit_1_ksp_type", "preonly")
    return base


def params_for(approach: Approach) -> Dict:
    """Solver options per approach (reference ``:157-188``)."""
    if approach == Approach.PLAIN_GMRES:
        return solver_params.PLAIN_GMRES_PARAMS.copy()
    elif approach == Approach.GMRES_ILU:
        return solver_params.GMRES_ILU_PARAMS.copy()
    elif approach == Approach.SS_GMRES:
        return {
            **solver_params.GMRES_PARAMS.copy(),
            **solver_params.FIELDSPLIT_LU_PARAMS.copy(),
        }
    elif approach == Approach.SS_GMRES_ILU:
        return {
            **solver_params.GMRES_PARAMS.copy(),
            **solver_params.FIELDSPLIT_GMRES_ILU_PARAMS.copy(),
        }
    elif approach == Approach.MONOLITHIC_MUMPS:
        return solver_params.LINEAR_SOLVER_PARAMS.copy()
    elif approach == Approach.PICARD_MUMPS:
        return solver_params.PICARD_LU_SOLVER_PARAMS.copy()
    else:
        raise ValueError(f"Unknown approach: {approach}")


def solve_on_mesh(
    W: MixedFunctionSpace,
    approach: Approach,
    params: Optional[DPPParameters] = None,
    bcs: Optional[List[DirichletBC]] = None,
) -> SolveResult:
    """Solve with the given approach (reference ``:191-252``)."""
    params = params or default_model_params()
    bcs = bcs or default_bcs(W)
    sp_dict = params_for(approach)

    if approach == Approach.PICARD_MUMPS:
        sol = solve_dpp_nonlinear(W, params, bcs=bcs, solver_parameters=sp_dict)
    else:
        sol = solve_dpp(W, params, bcs=bcs, solver_parameters=sp_dict)

    fields = tuple(sol.solution.split())
    return SolveResult(
        approach=approach,
        nx=-1,
        ny=-1,
        iteration_number=sol.iteration_number,
        residual_error=float(sol.residual_error),
        fields=fields,
    )


def assemble_monolithic_matrix(
    W: MixedFunctionSpace,
    params: Optional[DPPParameters] = None,
    bcs: Optional[List[DirichletBC]] = None,
) -> Tuple[sp.csr_matrix, int, int]:
    """Monolithic CSR + block sizes (reference ``:255-287``)."""
    params = params or default_model_params()
    return materialize_monolithic_csr(W, params)


def estimate_condition_numbers(
    W: MixedFunctionSpace,
    params: Optional[DPPParameters] = None,
    bcs: Optional[List[DirichletBC]] = None,
    num_of_factors: Optional[int] = 50,
    use_sparse: bool = True,
) -> Dict[str, float]:
    """Condition numbers of the monolithic matrix and its diagonal blocks
    (reference ``:290-337``)."""
    params = params or default_model_params()
    csr, n0, n1 = assemble_monolithic_matrix(W, params=params, bcs=bcs)

    # In sparse mode, supply the exact fast-diag inverse so lam_min comes
    # from rapidly-converging inverse Lanczos (the ARPACK shift-invert role).
    inv_mono = inv_00 = inv_11 = None
    mesh = W.mesh
    if use_sparse and mesh.is_tensor_product:
        import jax.numpy as jnp

        from perphil_tpu.ops.direct import FastDiagDPPSolver, FastDiagFieldSolver

        shape = mesh.node_shape
        fd_mono = FastDiagDPPSolver(mesh, params)
        fd0 = FastDiagFieldSolver(mesh, params.k1, params.beta, params.mu)
        fd1 = FastDiagFieldSolver(mesh, params.k2, params.beta, params.mu)

        def inv_mono(x, _fd=fd_mono, _n=n0):
            z1, z2 = _fd.solve(x[:_n].reshape(shape), x[_n:].reshape(shape))
            return jnp.concatenate([z1.ravel(), z2.ravel()])

        def inv_00(x, _fd=fd0):
            return _fd.solve(x.reshape(shape)).ravel()

        def inv_11(x, _fd=fd1):
            return _fd.solve(x.reshape(shape)).ravel()

    elif use_sparse:
        # simplicial meshes: exact inverse application via tightly-converged
        # PCG (same machinery the "LU" role uses; docs/design.md §3)
        import jax.numpy as jnp

        from perphil_tpu.ops.assembly import DPPOperator, FieldOperator
        from perphil_tpu.solvers.solver import _exact_field_solver, _monolithic_direct

        shape = mesh.node_shape
        op = DPPOperator(W, params)
        direct_mono = _monolithic_direct(op)
        B0 = _exact_field_solver(
            FieldOperator(W.sub(0), params.k1, params.beta, params.mu)
        )
        B1 = _exact_field_solver(
            FieldOperator(W.sub(1), params.k2, params.beta, params.mu)
        )

        def inv_mono(x, _n=n0):
            z1, z2 = direct_mono(x[:_n].reshape(shape), x[_n:].reshape(shape))
            return jnp.concatenate([z1.ravel(), z2.ravel()])

        def inv_00(x):
            return B0(x.reshape(shape)).ravel()

        def inv_11(x):
            return B1(x.reshape(shape)).ravel()

    cond_full = conditioning.calculate_condition_number(
        csr, num_singular_values=num_of_factors, use_sparse=use_sparse,
        inv_apply=inv_mono,
    )
    A00 = csr[:n0, :n0].tocsr()
    A11 = csr[n0 : n0 + n1, n0 : n0 + n1].tocsr()
    cond_00 = conditioning.calculate_condition_number(
        A00, num_singular_values=num_of_factors, use_sparse=use_sparse,
        inv_apply=inv_00,
    )
    cond_11 = conditioning.calculate_condition_number(
        A11, num_singular_values=num_of_factors, use_sparse=use_sparse,
        inv_apply=inv_11,
    )
    return {"monolithic": cond_full, "macro": cond_00, "micro": cond_11}


def l2_errors_against_reference(
    W: MixedFunctionSpace,
    fields: Tuple[Function, Function],
    ref_fields: Tuple[Function, Function],
) -> Tuple[float, float]:
    """Per-field L2 errors against a reference solution (reference
    ``:340-362``)."""
    p1, p2 = fields
    r1, r2 = ref_fields
    return float(l2_error(p1, r1)), float(l2_error(p2, r2))
