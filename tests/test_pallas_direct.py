"""Fused whole-solve direct (fast-diag) kernel (``ops/pallas_direct``).

Interpret mode on CPU with ``eft_safe_compiler_options()`` (see
``tests/test_pallas_gmres.py`` for why).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, DPPOperator
from perphil_tpu.ops.df32 import eft_safe_compiler_options

# slow: interpret-mode fused direct-solve validation; run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow



def _setup(dim, N):
    params = DPPParameters()
    if dim == 2:
        from perphil_tpu.utils.manufactured_solutions import exact_expressions

        mesh = create_mesh(N, N)
        _, p1e, _, p2e = exact_expressions(mesh, params)
    else:
        from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

        mesh = create_cube_mesh(N, N, N, hexahedral=True)
        _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, params)
    g1 = jnp.asarray(DirichletBC(W.sub(0), p1e).grid_values(mesh))
    g2 = jnp.asarray(DirichletBC(W.sub(1), p2e).grid_values(mesh))
    b1, b2 = op.lifted_rhs(g1, g2)
    return op, b1, b2


@pytest.mark.parametrize("dim,N", [(2, 8), (3, 4)])
def test_fused_direct_matches_mixed_path(dim, N, monkeypatch):
    """One Pallas kernel == MixedPrecisionDPPDirect (same mixed-precision
    algorithm): ~1e-15-relative solutions, ~1e-9 true residuals."""
    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "force")
    from perphil_tpu.ops.mixed import MixedPrecisionDPPDirect
    from perphil_tpu.ops.pallas_direct import (
        fused_direct_solve,
        fused_direct_supported,
    )

    op, b1, b2 = _setup(dim, N)
    assert fused_direct_supported(op)
    z1r, z2r = MixedPrecisionDPPDirect(op.mesh, op.params).solve(b1, b2)
    solve = fused_direct_solve(op)
    fn = (
        jax.jit(lambda: solve(b1, b2))
        .lower()
        .compile(compiler_options=eft_safe_compiler_options())
    )
    z1, z2 = fn()
    scale = float(jnp.max(jnp.abs(z1r)))
    assert float(jnp.max(jnp.abs(z1 - z1r))) <= 1e-12 * scale
    assert float(jnp.max(jnp.abs(z2 - z2r))) <= 1e-12 * scale
    mv = op.stacked_matvec()
    res = float(jnp.linalg.norm(jnp.stack([b1, b2]) - mv(jnp.stack([z1, z2]))))
    bn = float(jnp.linalg.norm(jnp.stack([b1, b2])))
    assert res <= 1e-11 * bn


@pytest.mark.parametrize("dim,N", [(2, 6), (3, 3)])
def test_fused_simplicial_pcg_matches_xla(dim, N, monkeypatch):
    """Simplicial MUMPS role: one-kernel double-float PCG with the lumped
    fast-diag block preconditioner == the XLA PCG path."""
    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "force")
    from perphil_tpu.ops.pallas_direct import (
        fused_simplicial_direct_solve,
        fused_simplicial_direct_supported,
    )

    params = DPPParameters()
    if dim == 2:
        from perphil_tpu.utils.manufactured_solutions import exact_expressions

        mesh = create_mesh(N, N, quadrilateral=False)
        _, p1e, _, p2e = exact_expressions(mesh, params)
    else:
        from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

        mesh = create_cube_mesh(N, N, N, hexahedral=False)
        _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, params)
    assert fused_simplicial_direct_supported(op)
    g1 = jnp.asarray(DirichletBC(W.sub(0), p1e).grid_values(mesh))
    g2 = jnp.asarray(DirichletBC(W.sub(1), p2e).grid_values(mesh))
    b1, b2 = op.lifted_rhs(g1, g2)
    solve = fused_simplicial_direct_solve(op)
    fn = (
        jax.jit(lambda: solve(b1, b2))
        .lower()
        .compile(compiler_options=eft_safe_compiler_options())
    )
    z1, z2 = fn()
    mv = op.stacked_matvec()
    res = float(jnp.linalg.norm(jnp.stack([b1, b2]) - mv(jnp.stack([z1, z2]))))
    bn = float(jnp.linalg.norm(jnp.stack([b1, b2])))
    assert res <= 1e-11 * bn

    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "0")
    from perphil_tpu.solvers.solver import _monolithic_direct

    z1r, z2r = _monolithic_direct(op)(b1, b2)
    scale = float(jnp.max(jnp.abs(z1r)))
    assert float(jnp.max(jnp.abs(z1 - z1r))) <= 1e-10 * scale


def test_fused_direct_gating(monkeypatch):
    from perphil_tpu.ops import pallas_direct

    op, _, _ = _setup(2, 8)
    monkeypatch.delenv("PERPHIL_TPU_FUSED_DIRECT", raising=False)
    if jax.default_backend().lower() not in ("tpu", "axon"):
        assert not pallas_direct.fused_direct_supported(op)
    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "force")
    assert pallas_direct.fused_direct_supported(op)
    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "0")
    assert not pallas_direct.fused_direct_supported(op)

    # simplicial meshes stay on the CG-based path
    monkeypatch.setenv("PERPHIL_TPU_FUSED_DIRECT", "force")
    params = DPPParameters()
    tri = create_mesh(4, 4, quadrilateral=False)
    _, V = create_function_spaces(tri)
    W = mixed_space(V)
    op_tri = DPPOperator(W, params)
    assert not pallas_direct.fused_direct_supported(op_tri)
