"""Structured ILU(0) tests: the wavefront factorization must match a
straightforward sequential reference ILU(0) on the same pattern."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DPPOperator, FieldOperator, materialize_monolithic_csr
from perphil_tpu.ops.ilu import (
    GaussSeidelSweeper,
    StructuredILU0,
    build_monolithic_system,
    ilu0_factorize,
)


def _system_to_dense(sysm, vals=None):
    v = sysm.vals if vals is None else vals
    n = sysm.nrows
    A = np.zeros((n, n))
    for t, d in enumerate(sysm.deltas):
        for r in range(n):
            c = r + d
            if 0 <= c < n and sysm.valid[r, t]:
                A[r, c] = v[r, t]
    return A


def _sequential_ilu0(A_dense, pattern):
    """Textbook IKJ ILU(0) restricted to the given boolean pattern."""
    n = A_dense.shape[0]
    F = A_dense.copy()
    for i in range(n):
        for k in range(i):
            if not pattern[i, k] or F[i, k] == 0.0:
                continue
            F[i, k] /= F[k, k]
            for j in range(k + 1, n):
                if pattern[i, j]:
                    F[i, j] -= F[i, k] * F[k, j]
    return F


def test_ilu0_matches_sequential_reference():
    mesh = create_mesh(3, 3)
    params = DPPParameters()
    sysm = build_monolithic_system(mesh, params)
    A = _system_to_dense(sysm)
    pattern = np.zeros_like(A, dtype=bool)
    n = sysm.nrows
    for t, d in enumerate(sysm.deltas):
        for r in range(n):
            c = r + d
            if 0 <= c < n and sysm.valid[r, t]:
                pattern[r, c] = True
    F_ref = _sequential_ilu0(A, pattern)
    F = ilu0_factorize(sysm)
    F_dense = _system_to_dense(sysm, vals=F)
    assert np.abs(F_dense - F_ref).max() < 1e-12


def test_ilu_apply_is_lu_solve(monkeypatch):
    monkeypatch.setenv("PERPHIL_TPU_ILU_DTYPE", "float64")  # exactness test
    mesh = create_mesh(4, 4)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, params)
    ilu = StructuredILU0.for_monolithic(op)
    sysm = build_monolithic_system(mesh, params)
    F = ilu0_factorize(sysm)
    Fd = _system_to_dense(sysm, vals=F)
    L = np.tril(Fd, -1) + np.eye(sysm.nrows)
    U = np.triu(Fd)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(sysm.nrows)
    z = np.asarray(ilu.apply_flat(jnp.asarray(r)))
    z_ref = np.linalg.solve(U, np.linalg.solve(L, r))
    assert np.abs(z - z_ref).max() < 1e-11


def test_ilu_apply_f32_default_close():
    """Default (float32) PC application stays within f32 accuracy of the
    exact L/U solves — plenty for preconditioning."""
    mesh = create_mesh(4, 4)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, params)
    ilu = StructuredILU0.for_monolithic(op)
    assert ilu.factors.dtype == jnp.float32
    sysm = build_monolithic_system(mesh, params)
    F = ilu0_factorize(sysm)
    Fd = _system_to_dense(sysm, vals=F)
    L = np.tril(Fd, -1) + np.eye(sysm.nrows)
    U = np.triu(Fd)
    rng = np.random.default_rng(0)
    r = rng.standard_normal(sysm.nrows)
    z = np.asarray(ilu.apply_flat(jnp.asarray(r)))
    z_ref = np.linalg.solve(U, np.linalg.solve(L, r))
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < 1e-5


def test_gs_sweep_matches_dense():
    mesh = create_mesh(3, 3)
    params = DPPParameters()
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    A, n0, _ = materialize_monolithic_csr(W, params)
    A = A.toarray()
    sweeper = GaussSeidelSweeper.for_monolithic(mesh, params)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(2 * n0)
    x0 = rng.standard_normal(2 * n0)
    x1 = np.asarray(sweeper.sweep(jnp.asarray(x0), jnp.asarray(b)))
    # reference forward GS: x = (D+L)^{-1} (b - U x0)
    import scipy.linalg as sla

    Lo = np.tril(A)
    Uo = A - Lo
    x_ref = sla.solve_triangular(Lo, b - Uo @ x0, lower=True)
    assert np.abs(x1 - x_ref).max() < 1e-11


def test_apply_flat_df_matches_f64_factor_solve():
    """apply_flat_df (df32 mode: f32 trisolves + one double-float defect
    correction against the df-stored f64 factor) must match the dense f64
    L/U solve to ~1e-13 relative — the accuracy class that keeps the 2D
    N=64 GMRES+ILU golden count at 42 (docs/design.md §7)."""
    import numpy as np

    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.mesh import create_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DPPOperator
    from perphil_tpu.ops.ilu import (
        StructuredILU0,
        build_monolithic_system,
        ilu0_factorize,
    )

    mesh = create_mesh(6, 6)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    op = DPPOperator(W, DPPParameters())
    sys = build_monolithic_system(mesh, DPPParameters())
    f = ilu0_factorize(sys)
    n = f.shape[0]
    L = np.eye(n)
    U = np.zeros((n, n))
    for t, d in enumerate(sys.deltas):
        idx = np.arange(n)
        j = idx + d
        ok = (j >= 0) & (j < n)
        if d < 0:
            L[idx[ok], j[ok]] = f[idx[ok], t]
        elif d > 0:
            U[idx[ok], j[ok]] = f[idx[ok], t]
        else:
            U[idx, idx] = f[:, t]
    ilu = StructuredILU0.for_monolithic(op, dtype_mode="df32")
    assert ilu.factors_lo is not None
    rng = np.random.default_rng(3)
    r64 = rng.standard_normal(n)
    rh = np.asarray(r64, np.float32)
    rl = np.asarray(r64 - rh.astype(np.float64), np.float32)
    zh, zl = ilu.apply_flat_df((jnp.asarray(rh), jnp.asarray(rl)))
    z = np.asarray(zh, np.float64) + np.asarray(zl, np.float64)
    z_ref = np.linalg.solve(U, np.linalg.solve(L, r64))
    rel = np.abs(z - z_ref).max() / np.abs(z_ref).max()
    assert rel < 1e-12, rel
    # and the f32 single-pass apply is genuinely ~6 orders worse, so the
    # test discriminates (guards against apply_flat_df silently reducing
    # to the f32 path)
    z32 = np.asarray(ilu.apply_flat(jnp.asarray(r64)), np.float64)
    rel32 = np.abs(z32 - z_ref).max() / np.abs(z_ref).max()
    assert rel32 > 1e-9, rel32
