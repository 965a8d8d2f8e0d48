"""DoF orderings and fill patterns for ILU/Gauss-Seidel parity analysis.

The reference's ILU(0) and pointwise-GS counts depend on two conventions
this library's structured solvers fix differently:

1. **DoF ordering.** Firedrake numbers DoFs through DMPlex with RCM-style
   mesh reordering enabled by default (``firedrake.Mesh(..., reorder=True)``);
   we use lexicographic field-major order (``ops/ilu.py``). ILU triangular
   factors and GS sweeps are ordering-dependent.
2. **Fill pattern.** PETSc's ILU(0) fills exactly the allocated AIJ
   pattern, which for simplex meshes is the true finite-element adjacency
   (~15 of 27 3D stencil offsets); our structured systems carry the full
   3^d offset envelope with explicit zeros, giving ILU(0) extra fill
   positions — a *stronger* preconditioner (fewer iterations).

This module provides host-side (numpy/scipy) reference implementations of
both conventions so the difference can be measured exactly, plus the
orderings themselves:

- ``to_csr`` / ``tighten_pattern``: structured system -> CSR in envelope or
  finite-element ("tight") pattern.
- ``vertex_rcm`` / ``cell_rcm`` / ``random_ordering``: candidate DoF
  orderings. ``cell_rcm`` emulates Firedrake's scheme (RCM on the cell
  dual graph, vertices numbered by first appearance in the reordered cell
  traversal) and, combined with the tight pattern, reproduces the
  reference's 3D tet GMRES+ILU counts 6/8/15/26 at nx=4/8/16/32 exactly
  (``/root/reference/notebooks/results-conforming-3d/petsc_profiling/
  petsc_perf_breakdown_3d.csv``).
- ``host_ilu0`` / ``host_ilu_apply``: sequential IKJ ILU(0) on CSR.
- ``host_gmres``: PETSc-semantics GMRES(30) (left PC, CGS, preconditioned
  residual, KSPConvergedDefault).
- ``host_gs_sweeps``: pointwise GS with SNESConvergedDefault-style
  stopping (rtol on ||F||, atol, and the snes_stol step test).

These are analysis tools (pure host code, used by
``experiments/ordering_study.py`` and the regression tests); production
solves stay on the structured TPU path, whose envelope-pattern ILU is both
faster per application and stronger per iteration.
"""

from __future__ import annotations

import itertools
from typing import Callable, Optional, Tuple

import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from perphil_tpu.mesh.structured import StructuredMesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops.ilu import StructuredSystem

__all__ = [
    "to_csr",
    "tighten_pattern",
    "vertex_rcm",
    "cell_rcm",
    "random_ordering",
    "blocked",
    "host_ilu0",
    "host_ilu_apply",
    "host_gmres",
    "host_gs_sweeps",
]


def to_csr(sysm: StructuredSystem) -> sp.csr_matrix:
    """Materialize a structured system as CSR, keeping the full offset
    envelope including explicit zeros (PETSc keeps allocated zeros, so this
    is the pattern the structured ILU factorizes)."""
    nrows = sysm.nrows
    cols_mat = np.arange(nrows)[:, None] + sysm.deltas[None, :]
    ok = sysm.valid & (cols_mat >= 0) & (cols_mat < nrows)
    rows, cols = np.nonzero(ok)[0], cols_mat[ok]
    return sp.csr_matrix((sysm.vals[ok], (rows, cols)), shape=(nrows, nrows))


def tighten_pattern(
    A: sp.spmatrix, sysm: StructuredSystem, mesh: StructuredMesh, params: DPPParameters
) -> sp.csr_matrix:
    """Restrict the CSR pattern to the true finite-element adjacency.

    Keeps only positions whose *raw* (pre-BC-elimination) stencil weight is
    nonzero — the pattern Firedrake allocates — while preserving explicit
    zeros introduced by the symmetric BC elimination (PETSc
    MatZeroRowsColumns keeps the allocated pattern). For quads/hexes every
    envelope offset has nonzero weight, so this is the identity there; for
    simplex meshes it drops the never-coupled offsets (12 of 27 in 3D).
    """
    from perphil_tpu.ops.stencil import compile_stencils

    K_st, M_st = (np.asarray(s) for s in compile_stencils(mesh))
    p = params
    raw = {
        (0, 0): (p.k1 / p.mu) * K_st + (p.beta / p.mu) * M_st,
        (1, 1): (p.k2 / p.mu) * K_st + (p.beta / p.mu) * M_st,
        (0, 1): -(p.beta / p.mu) * M_st,
        (1, 0): -(p.beta / p.mu) * M_st,
    }
    nrows, n = sysm.nrows, sysm.n_nodes
    keep = np.zeros((nrows, sysm.vals.shape[1]), dtype=bool)
    for t in range(sysm.vals.shape[1]):
        bd = int(sysm.blocks[t])
        g = sysm.geoms[t]
        for f in range(sysm.nfields):
            cf = f + bd
            if cf < 0 or cf >= sysm.nfields:
                continue
            w = raw[(f, cf)][tuple(int(o) + 1 for o in reversed(g))]
            if w != 0.0 or (bd == 0 and (g == 0).all()):
                keep[f * n : (f + 1) * n, t] = True
    cols_mat = np.arange(nrows)[:, None] + sysm.deltas[None, :]
    ok = sysm.valid & keep & (cols_mat >= 0) & (cols_mat < nrows)
    rows, cols = np.nonzero(ok)[0], cols_mat[ok]
    vals = np.asarray(A.tocsr()[rows, cols]).ravel()
    return sp.csr_matrix((vals, (rows, cols)), shape=A.shape)


# ---------------------------------------------------------------------------
# orderings (vertex permutations; use `blocked` to extend to 2-field systems)


def blocked(vertex_perm: np.ndarray, nfields: int = 2) -> np.ndarray:
    """Extend a vertex permutation to a field-major blocked DoF permutation
    (Firedrake numbers mixed spaces field-by-field)."""
    nv = vertex_perm.shape[0]
    return np.concatenate([vertex_perm + f * nv for f in range(nfields)])


def vertex_rcm(A_vertex: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee on the vertex adjacency graph."""
    Adj = abs(A_vertex) + abs(A_vertex).T
    return np.asarray(reverse_cuthill_mckee(Adj.tocsr(), symmetric_mode=True))


def random_ordering(n: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).permutation(n)


def _simplex_cells(mesh: StructuredMesh) -> np.ndarray:
    """Global vertex ids of every simplex cell, matching the element
    conventions in ``ops/element.py`` (2 right-diagonal triangles per quad,
    6 Kuhn tets per cube)."""
    d = mesh.dim
    shape = mesh.node_shape
    strides = [1]
    for ax in range(1, d):
        strides.append(strides[-1] * shape[d - ax])
    strides = np.array(strides)
    cells = []
    if d == 3:
        nx, ny, nz = mesh.cells
        offs = []
        for perm in itertools.permutations(range(3)):
            v = [np.zeros(3, dtype=np.int64)]
            for axis in perm:
                nxt = v[-1].copy()
                nxt[axis] = 1
                v.append(nxt)
            offs.append(np.stack(v))
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    base = np.array([i, j, k])
                    for o in offs:
                        cells.append((base + o) @ strides)
    else:
        nx, ny = mesh.cells
        tris = [
            np.array([[0, 0], [1, 0], [1, 1]]),
            np.array([[0, 0], [1, 1], [0, 1]]),
        ]
        for j in range(ny):
            for i in range(nx):
                base = np.array([i, j])
                for o in tris:
                    cells.append((base + o) @ strides)
    return np.array(cells)


def cell_rcm(mesh: StructuredMesh) -> np.ndarray:
    """Firedrake-like mesh reordering: RCM on the cell dual graph (cells
    adjacent through a shared facet), then vertices numbered by first
    appearance in the reordered cell traversal. Returns ``perm`` such that
    ``x_new = x_old[perm]`` (``perm[new_index] = old_index``)."""
    from collections import defaultdict

    d = mesh.dim
    nv = mesh.num_vertices
    cells = _simplex_cells(mesh)
    nc = len(cells)

    facet_map = defaultdict(list)
    for c, vs in enumerate(cells):
        for f in itertools.combinations(sorted(vs), d):
            facet_map[f].append(c)
    rows, cols = [], []
    for cs in facet_map.values():
        if len(cs) == 2:
            rows += [cs[0], cs[1]]
            cols += [cs[1], cs[0]]
    G = sp.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(nc, nc))
    corder = np.asarray(reverse_cuthill_mckee(G, symmetric_mode=True))

    new = np.full(nv, -1, dtype=np.int64)
    nxt = 0
    for c in corder:
        for v in cells[c]:
            if new[v] < 0:
                new[v] = nxt
                nxt += 1
    assert nxt == nv, "cell traversal did not reach every vertex"
    perm = np.empty(nv, dtype=np.int64)
    perm[new] = np.arange(nv)
    return perm


# ---------------------------------------------------------------------------
# host reference solvers (sequential, exact semantics)


def host_ilu0(A: sp.spmatrix) -> Tuple[sp.csr_matrix, np.ndarray]:
    """Sequential IKJ ILU(0) on CSR, filling exactly A's stored pattern
    (explicit zeros included, like PETSc). Returns (factors, diag_ptr)."""
    F = A.tocsr().copy()
    F.sort_indices()
    n = F.shape[0]
    indptr, indices, data = F.indptr, F.indices, F.data
    diag = np.zeros(n, dtype=np.int64)
    for i in range(n):
        row = indices[indptr[i] : indptr[i + 1]]
        diag[i] = indptr[i] + np.searchsorted(row, i)
    for i in range(n):
        s = indptr[i]
        row_cols = indices[s : indptr[i + 1]]
        for kk in range(s, diag[i]):
            k = indices[kk]
            piv = data[kk] / data[diag[k]]
            data[kk] = piv
            ks, ke = diag[k] + 1, indptr[k + 1]
            jj = np.searchsorted(row_cols, indices[ks:ke])
            ok = (jj < len(row_cols)) & (
                row_cols[np.minimum(jj, len(row_cols) - 1)] == indices[ks:ke]
            )
            data[s + jj[ok]] -= piv * data[ks:ke][ok]
    return F, diag


def host_ilu_apply(F: sp.csr_matrix, diag: np.ndarray, r: np.ndarray) -> np.ndarray:
    """x = U^-1 L^-1 r by sequential forward/backward substitution."""
    indptr, indices, data = F.indptr, F.indices, F.data
    n = F.shape[0]
    y = np.zeros(n)
    for i in range(n):
        s = r[i]
        for kk in range(indptr[i], diag[i]):
            s -= data[kk] * y[indices[kk]]
        y[i] = s
    x = np.zeros(n)
    for i in range(n - 1, -1, -1):
        s = y[i]
        for kk in range(diag[i] + 1, indptr[i + 1]):
            s -= data[kk] * x[indices[kk]]
        x[i] = s / data[diag[i]]
    return x


def host_gmres(
    mv: Callable[[np.ndarray], np.ndarray],
    b: np.ndarray,
    pc: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    restart: int = 30,
    max_it: int = 10000,
) -> int:
    """Left-preconditioned GMRES(restart) iteration count with PETSc
    KSPGMRES semantics (preconditioned residual norm, classical
    Gram-Schmidt, KSPConvergedDefault). Mirrors ``ops/krylov.py::gmres``
    in plain numpy so host callbacks (sequential ILU) can serve as PC."""
    pc = pc or (lambda v: v)
    n = b.shape[0]
    x = np.zeros(n)
    its = 0
    rnorm0 = np.linalg.norm(pc(b - mv(x)))
    tol = max(rtol * rnorm0, atol)
    rnorm = rnorm0
    while its < max_it:
        r = pc(b - mv(x))
        beta = np.linalg.norm(r)
        if beta <= tol:
            break
        V = np.zeros((restart + 1, n))
        H = np.zeros((restart + 1, restart))
        cs, sn = np.zeros(restart), np.zeros(restart)
        g = np.zeros(restart + 1)
        V[0] = r / beta
        g[0] = beta
        k = 0
        while k < restart and its < max_it:
            w = pc(mv(V[k]))
            h = V[: k + 1] @ w
            w = w - V[: k + 1].T @ h
            hk1 = np.linalg.norm(w)
            H[: k + 1, k] = h
            H[k + 1, k] = hk1
            for i in range(k):
                t = cs[i] * H[i, k] + sn[i] * H[i + 1, k]
                H[i + 1, k] = -sn[i] * H[i, k] + cs[i] * H[i + 1, k]
                H[i, k] = t
            d = np.hypot(H[k, k], H[k + 1, k])
            cs[k], sn[k] = H[k, k] / d, H[k + 1, k] / d
            H[k, k] = d
            H[k + 1, k] = 0.0
            g[k + 1] = -sn[k] * g[k]
            g[k] = cs[k] * g[k]
            if hk1 > 0:
                V[k + 1] = w / hk1
            k += 1
            its += 1
            rnorm = abs(g[k])
            if rnorm <= tol:
                break
        y = np.linalg.solve(H[:k, :k], g[:k]) if k else np.zeros(0)
        x = x + V[:k].T @ y
        if rnorm <= tol:
            break
    return its


def host_gs_sweeps(
    A: sp.csr_matrix,
    b: np.ndarray,
    x0: np.ndarray,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    stol: float = 1e-8,
    max_it: int = 20000,
) -> int:
    """Sequential pointwise Gauss-Seidel sweep count with
    SNESConvergedDefault-style stopping: ||F|| <= max(rtol*||F0||, atol) or
    ||dx|| < stol*||x|| (PETSc snes_stol, default 1e-8)."""
    A = A.tocsr()
    A.sort_indices()
    n = A.shape[0]
    indptr, indices, data = A.indptr, A.indices, A.data
    diag = A.diagonal()
    x = x0.copy()
    f0 = np.linalg.norm(b - A @ x)
    tol = max(rtol * f0, atol)
    sweeps = 0
    fn = f0
    while fn > tol and sweeps < max_it:
        prev = x.copy()
        for i in range(n):
            s = b[i]
            for kk in range(indptr[i], indptr[i + 1]):
                j = indices[kk]
                if j != i:
                    s -= data[kk] * x[j]
            x[i] = s / diag[i]
        sweeps += 1
        fn = np.linalg.norm(b - A @ x)
        if np.linalg.norm(x - prev) < stol * np.linalg.norm(x):
            break
    return sweeps
