"""Solver parameter presets.

Parity with ``/root/reference/src/perphil/solvers/parameters.py:1-102``: the
same 11 preset dictionaries with the same PETSc-style keys, consumed by
``perphil_tpu.solvers.solver`` which maps each option onto the TPU-native
solver stack:

  - ``ksp_type: gmres``      -> JAX restarted GMRES (``ops/krylov.py``)
  - ``ksp_type: preonly`` + ``pc_type: lu`` (``mumps``) -> exact tensor
    fast-diagonalization direct solve (``ops/direct.py``)
  - ``pc_type: fieldsplit`` (multiplicative) -> explicit 2x2 block
    Gauss-Seidel with per-block solvers
  - ``pc_type: ilu`` -> structured ILU(0) with wavefront triangular solves
  - ``pc_type: jacobi`` -> diagonal scaling
  - ``snes_type: ngs`` -> Picard block Gauss-Seidel sweeps
  - ``snes_type: nrichardson`` -> damped preconditioned Richardson

Keys that only make sense for PETSc internals (``mat_type``,
``pc_factor_mat_solver_type``, ``ksp_monitor``) are accepted and ignored, so
user code written against the reference keeps working unchanged.
"""

_MAX_ITERATION_NUMBER = 50000

# Linear monolithic solver parameters (direct solver; reference uses MUMPS)
LINEAR_SOLVER_PARAMS: dict = {
    "mat_type": "aij",
    "ksp_type": "preonly",
    "pc_type": "lu",
    "pc_factor_mat_solver_type": "mumps",
}

# Pure GMRES parameters
GMRES_PARAMS: dict = {
    "mat_type": "aij",
    "ksp_type": "gmres",
    "ksp_rtol": 1.0e-8,
    "ksp_atol": 1.0e-12,
    "ksp_max_it": _MAX_ITERATION_NUMBER,
}

# Plain GMRES without preconditioners
PLAIN_GMRES_PARAMS: dict = {"pc_type": "none", **GMRES_PARAMS}

# GMRES + Jacobi parameters for scale-splitting comparison
GMRES_JACOBI_PARAMS: dict = {"pc_type": "jacobi", **GMRES_PARAMS}

# GMRES + ILU additional parameters for scale-splitting comparison
GMRES_ILU_PARAMS: dict = {"pc_type": "ilu", "pc_factor_levels": 0, **GMRES_PARAMS}

# Field-split preconditioner (multiplicative) with exact (LU-class) block solves
FIELDSPLIT_LU_PARAMS: dict = {
    "pc_type": "fieldsplit",
    "pc_fieldsplit_type": "multiplicative",
    "pc_fieldsplit_0_fields": "0",
    "pc_fieldsplit_1_fields": "1",
    "fieldsplit_0": LINEAR_SOLVER_PARAMS,
    "fieldsplit_1": LINEAR_SOLVER_PARAMS,
}

# Field-split preconditioner (multiplicative) with GMRES in each block
FIELDSPLIT_GMRES_PARAMS: dict = {
    "pc_type": "fieldsplit",
    "pc_fieldsplit_type": "multiplicative",
    "pc_fieldsplit_0_fields": "0",
    "pc_fieldsplit_1_fields": "1",
    "fieldsplit_0": PLAIN_GMRES_PARAMS,
    "fieldsplit_1": PLAIN_GMRES_PARAMS,
}

# Field-split preconditioner (multiplicative) with GMRES + ILU in each block
FIELDSPLIT_GMRES_ILU_PARAMS: dict = {
    "pc_type": "fieldsplit",
    "pc_fieldsplit_type": "multiplicative",
    "pc_fieldsplit_0_fields": "0",
    "pc_fieldsplit_1_fields": "1",
    "fieldsplit_0": GMRES_ILU_PARAMS,
    "fieldsplit_1": GMRES_ILU_PARAMS,
}

# Picard (nonlinear Richardson) solver parameters with field-split
RICHARDSON_SOLVER_PARAMS: dict = {
    "snes_type": "nrichardson",
    "snes_max_it": _MAX_ITERATION_NUMBER,
    "snes_linesearch_type": "basic",
    "snes_linesearch_damping": 0.5,
    "snes_rtol": 1e-5,
    "snes_atol": 1e-12,
    **FIELDSPLIT_LU_PARAMS,
}

# Picard (nonlinear Gauss-Seidel with exact block solves) with field-split
PICARD_LU_SOLVER_PARAMS = {
    "snes_type": "ngs",
    "snes_max_it": _MAX_ITERATION_NUMBER,
    "snes_rtol": 1e-8,
    "snes_atol": 1e-12,
    **FIELDSPLIT_LU_PARAMS,
}

# Picard (with GMRES block solves) with field-split
PICARD_GMRES_SOLVER_PARAMS = {
    "snes_type": "ngs",
    "snes_max_it": _MAX_ITERATION_NUMBER,
    "snes_rtol": 1e-8,
    "snes_atol": 1e-12,
    **FIELDSPLIT_GMRES_PARAMS,
}

# Picard (with GMRES + ILU block solves) with field-split
PICARD_GMRES_ILU_SOLVER_PARAMS = {
    "snes_type": "ngs",
    "snes_max_it": _MAX_ITERATION_NUMBER,
    "snes_rtol": 1e-8,
    "snes_atol": 1e-12,
    **FIELDSPLIT_GMRES_ILU_PARAMS,
}

# SNES with KSP-only (for preconditioner analysis)
KSP_PREONLY_PARAMS: dict = {
    "snes_type": "ksponly",
    "ksp_monitor": None,
    **FIELDSPLIT_LU_PARAMS,
}

# TPU-native extension: production direct solver for large meshes — f32 MXU
# fast-diagonalization with double-float iterative refinement (float64-level
# accuracy without emulated-f64 compute; see ops/mixed.py). Same semantics
# as LINEAR_SOLVER_PARAMS (preonly direct solve).
TPU_DIRECT_PARAMS: dict = {
    "mat_type": "aij",
    "ksp_type": "preonly",
    "pc_type": "lu",
    "pc_factor_mat_solver_type": "fastdiag_mixed",
}
