"""Iterative-bench integration tests (mirrors reference
``experiments/_tests/test_iterative_bench.py:24-29``)."""

import numpy as np
import pytest

from perphil_tpu.experiments.iterative_bench import (
    Approach,
    SolveResult,
    assemble_monolithic_matrix,
    build_mesh,
    build_spaces,
    default_bcs,
    default_model_params,
    l2_errors_against_reference,
    make_fieldsplit_params_with,
    params_for,
    solve_on_mesh,
)
from perphil_tpu.ops.assembly import DirichletBC
from perphil_tpu.utils.manufactured_solutions import exact_expressions


def test_params_for_all_approaches():
    for a in Approach:
        d = params_for(a)
        assert isinstance(d, dict) and d


def test_make_fieldsplit_params_with_ilu():
    d = make_fieldsplit_params_with("ilu")
    assert d["fieldsplit_0_pc_type"] == "ilu"
    assert d["ksp_type"] == "gmres"


@pytest.mark.parametrize("approach", list(Approach))
def test_solve_on_mesh_roundtrip(approach):
    mesh = build_mesh(3, 3)
    _, V, W = build_spaces(mesh)
    params = default_model_params()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    res = solve_on_mesh(W, approach, params=params, bcs=bcs)
    assert isinstance(res, SolveResult)
    assert res.iteration_number >= 1
    assert res.fields is not None and len(res.fields) == 2


def test_assemble_monolithic_matrix_shapes():
    mesh = build_mesh(2, 2)
    _, V, W = build_spaces(mesh)
    csr, n0, n1 = assemble_monolithic_matrix(W)
    assert csr.shape == (18, 18)
    assert (n0, n1) == (9, 9)


def test_l2_errors_against_reference():
    mesh = build_mesh(3, 3)
    _, V, W = build_spaces(mesh)
    params = default_model_params()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    r1 = solve_on_mesh(W, Approach.MONOLITHIC_MUMPS, params=params, bcs=bcs)
    r2 = solve_on_mesh(W, Approach.SS_GMRES, params=params, bcs=bcs)
    e1, e2 = l2_errors_against_reference(W, r2.fields, r1.fields)
    assert e1 < 1e-5 * abs(np.asarray(r1.fields[0].data)).max()
    assert e2 >= 0.0
