"""The reference README's minimal example (README.md:57-90), ported by
renaming the package and dropping the Firedrake namespace — verifies the
switching story end-to-end with the reference's own import paths."""

import numpy as np


def test_reference_readme_example():
    from perphil_tpu.mesh.builtin import create_mesh
    from perphil_tpu.forms.spaces import MixedFunctionSpace, create_function_spaces
    from perphil_tpu.forms.dpp import dpp_form
    from perphil_tpu.models.dpp.parameters import DPPParameters
    from perphil_tpu.utils.manufactured_solutions import exact_expressions
    from perphil_tpu.solvers.solver import solve_dpp
    from perphil_tpu.solvers.parameters import LINEAR_SOLVER_PARAMS
    from perphil_tpu.ops.assembly import DirichletBC

    mesh = create_mesh(16, 16, quadrilateral=True)
    _, V = create_function_spaces(mesh)
    W = MixedFunctionSpace((V, V))

    params = DPPParameters(k1=1.0, k2=1e-2, beta=1.0, mu=1.0)
    _, p1_exact, _, p2_exact = exact_expressions(mesh, params)
    bcs = [
        DirichletBC(W.sub(0), p1_exact, "on_boundary"),
        DirichletBC(W.sub(1), p2_exact, "on_boundary"),
    ]

    a, L = dpp_form(W, params)  # form construction as in the reference
    solution = solve_dpp(W, params, bcs=bcs, solver_parameters=LINEAR_SOLVER_PARAMS)
    assert solution.iteration_number == 1
    assert solution.residual_error == 0.0

    # 3D swap exactly as the README shows
    from perphil_tpu.mesh.builtin import create_cube_mesh
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

    mesh3 = create_cube_mesh(8, 8, 8)
    _, p1e3, _, p2e3 = exact_expressions_3d(mesh3, params)
    _, V3 = create_function_spaces(mesh3)
    W3 = MixedFunctionSpace((V3, V3))
    bcs3 = [DirichletBC(W3.sub(0), p1e3), DirichletBC(W3.sub(1), p2e3)]
    sol3 = solve_dpp(W3, params, bcs=bcs3, solver_parameters=LINEAR_SOLVER_PARAMS)
    assert sol3.iteration_number == 1
    z = np.concatenate([np.asarray(d).ravel() for d in sol3.solution.data])
    assert np.isfinite(z).all()
