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
- ``vertex_rcm`` / ``cell_rcm`` / ``cell_rcm_parity`` / ``random_ordering``:
  candidate DoF orderings. ``cell_rcm`` emulates Firedrake's scheme (RCM on
  the cell dual graph, vertices numbered by first appearance in the
  reordered cell traversal) and, combined with the tight pattern, reproduces
  the reference's 3D tet GMRES+ILU counts 6/8/15/26 at nx=4/8/16/32 exactly
  (``/root/reference/notebooks/results-conforming-3d/petsc_profiling/
  petsc_perf_breakdown_3d.csv``); ``cell_rcm_parity`` pins the RCM
  tie-break draw that also lands nx=40's 33, matching every published size,
  and backs the production ``pc_factor_mat_ordering_type=rcm`` option
  (``solvers/solver.py::_build_host_parity_ilu_solver``).
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
    "native_ilu_gmres",
    "cell_rcm_parity",
    "drand48_weights",
    "petsc_rander48_weights",
    "quad_cell_cm_parity",
    "ngs_parity_coloring",
    "greedy_coloring",
    "colored_ngs_sweeps",
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


def _cell_dual_graph(cells: np.ndarray, d: int) -> sp.csr_matrix:
    """Cell dual graph: cells adjacent through a shared facet."""
    from collections import defaultdict

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
    G.sort_indices()
    return G


def _cm_from_root(G: sp.csr_matrix, root: int, reverse: bool) -> np.ndarray:
    """Cuthill-McKee traversal from an explicit root (neighbors by
    increasing degree, stable on adjacency order), optionally reversed.
    SPARSEPACK's GENRCM is this with a pseudo-peripheral root and
    reverse=True; pinning the root reproduces a specific tie-break draw."""
    indptr, indices = G.indptr, G.indices
    n = G.shape[0]
    deg = np.diff(indptr)
    mask = np.zeros(n, dtype=bool)
    order = [root]
    mask[root] = True
    i = 0
    while i < len(order):
        u = order[i]
        nbrs = [v for v in indices[indptr[u] : indptr[u + 1]] if not mask[v]]
        nbrs.sort(key=lambda v: deg[v])
        for v in nbrs:
            mask[v] = True
            order.append(v)
        i += 1
    # remaining components (none for our connected meshes, but be safe)
    for s in range(n):
        if not mask[s]:
            comp = [s]
            mask[s] = True
            j = len(order)
            order.extend(comp)
            while j < len(order):
                u = order[j]
                nbrs = [v for v in indices[indptr[u] : indptr[u + 1]] if not mask[v]]
                nbrs.sort(key=lambda v: deg[v])
                for v in nbrs:
                    mask[v] = True
                    order.append(v)
                j += 1
    order = np.array(order, dtype=np.int64)
    return order[::-1] if reverse else order


def cell_rcm_parity(mesh: StructuredMesh) -> np.ndarray:
    """The specific cell-RCM tie-break draw that reproduces the reference's
    published simplex GMRES+ILU counts at EVERY size.

    ``cell_rcm`` (scipy RCM, pseudo-peripheral root) reproduces the 3D tet
    counts 6/8/15/26 at nx=4/8/16/32 but lands one iteration high at nx=40
    (34 vs 33, converging to 1.055e-8 relative at it 33 against tol 1e-8 —
    a 5.5% miss at a knife-edge). RCM numberings form a family indexed by
    tie-breaks (root choice, traversal direction); the reference's count is
    DMPlex's particular draw. A systematic search over 32 fixed geometric
    rules (direction x corner root x tet-in-cube) found exactly two that
    match all five published counts 6/8/15/26/33
    (``petsc_perf_breakdown_3d.csv``, nx=4..40): reversed CM rooted at the
    first simplex of the (nx-1, 0, .., 0) corner cell, and its unreversed
    mirror. This function pins the former. Within-cell closure order is
    irrelevant (measured: identical residual trajectories).
    """
    d = mesh.dim
    nv = mesh.num_vertices
    cells = _simplex_cells(mesh)
    G = _cell_dual_graph(cells, d)
    nsimplex = 6 if d == 3 else 2
    # corner cube (nx-1, 0[, 0]) in lexicographic cube order, first simplex
    root = nsimplex * (mesh.cells[0] - 1)
    corder = _cm_from_root(G, int(root), reverse=True)
    new = np.full(nv, -1, dtype=np.int64)
    nxt = 0
    for c in corder:
        for v in cells[c]:
            if new[v] < 0:
                new[v] = nxt
                nxt += 1
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
    return_solution: bool = False,
):
    """Left-preconditioned GMRES(restart) iteration count with PETSc
    KSPGMRES semantics (preconditioned residual norm, classical
    Gram-Schmidt, KSPConvergedDefault). Mirrors ``ops/krylov.py::gmres``
    in plain numpy so host callbacks (sequential ILU) can serve as PC.
    Returns ``its`` (default) or ``(its, x, rnorm)`` with
    ``return_solution=True``."""
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
    return (its, x, rnorm) if return_solution else its


def native_ilu0(A: sp.spmatrix) -> Tuple[sp.csr_matrix, np.ndarray]:
    """``host_ilu0`` at C speed via ``csrc/csr_solver.cpp``'s
    ``csr_ilu0_factorize`` (identical IKJ recurrence). Falls back to the
    numpy path when the native library is unavailable. Returns
    ``(factors, diag_ptr)`` like :func:`host_ilu0`."""
    import ctypes

    from perphil_tpu import _native

    lib = _native.load()
    if lib is None:
        return host_ilu0(A)
    F = A.tocsr().copy()
    F.sort_indices()
    n = F.shape[0]
    ai = F.indptr.astype(np.int64)
    aj = F.indices.astype(np.int64)
    fv = np.ascontiguousarray(F.data, dtype=np.float64)
    diag = np.zeros(n, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.csr_ilu0_factorize(
        n, ai.ctypes.data_as(i64p), aj.ctypes.data_as(i64p),
        fv.ctypes.data_as(dp), diag.ctypes.data_as(i64p),
    )
    if rc != 0:
        raise ZeroDivisionError("ILU(0): zero or missing pivot")
    return sp.csr_matrix((fv, aj, ai), shape=F.shape), diag


def native_ilu_gmres(
    A: sp.spmatrix,
    b: np.ndarray,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    restart: int = 30,
    max_it: int = 10000,
    with_history: bool = False,
    precondition: bool = True,
):
    """ILU(0)-preconditioned GMRES via the native CSR kernels
    (``csrc/csr_solver.cpp``) — same semantics as ``host_ilu0`` +
    ``host_gmres`` but at C speed, so parity runs reach the reference's
    largest published sizes (3D nx=40: n=137,842). Returns
    ``(its, x, rnorm, hist)`` where ``hist`` is the preconditioned residual
    norm trajectory (None unless ``with_history``). Returns None when the
    native library is unavailable (callers fall back to the numpy path).
    """
    import ctypes

    from perphil_tpu import _native

    lib = _native.load()
    if lib is None:
        return None
    A = A.tocsr().copy()
    A.sort_indices()
    n = A.shape[0]
    ai = A.indptr.astype(np.int64)
    aj = A.indices.astype(np.int64)
    av = np.ascontiguousarray(A.data, dtype=np.float64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)

    def _i(a):
        return a.ctypes.data_as(i64p)

    def _d(a):
        return a.ctypes.data_as(dp)

    if precondition:
        fv = av.copy()
        diag = np.zeros(n, dtype=np.int64)
        rc = lib.csr_ilu0_factorize(n, _i(ai), _i(aj), _d(fv), _i(diag))
        if rc != 0:
            raise ZeroDivisionError("ILU(0): zero or missing pivot")
        f_args = (_i(ai), _i(aj), _d(fv), _i(diag))
    else:
        null_i = ctypes.cast(None, i64p)
        f_args = (null_i, null_i, ctypes.cast(None, dp), null_i)
    x = np.zeros(n, dtype=np.float64)
    rnorm = np.zeros(1, dtype=np.float64)
    hist = np.zeros(max_it + 1, dtype=np.float64) if with_history else None
    bb = np.ascontiguousarray(b, dtype=np.float64)  # keep alive through the call
    its = lib.csr_gmres_ilu(
        n, _i(ai), _i(aj), _d(av), *f_args, _d(bb),
        float(rtol), float(atol), restart, max_it, _d(x), _d(rnorm),
        _d(hist) if with_history else ctypes.cast(None, dp),
    )
    return int(its), x, float(rnorm[0]), (hist[: int(its) + 1] if with_history else None)


def native_ilu_gmres_solver(
    A: sp.spmatrix,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    restart: int = 30,
    max_it: int = 10000,
):
    """Factor-once variant of :func:`native_ilu_gmres`: performs the ILU(0)
    factorization a single time (PETSc's PCSetUp happens once per solver,
    not per solve — reference profiling records it under ``time_PCSetUp``)
    and returns ``solve(b) -> (its, x, rnorm)`` reusing the factors.
    Returns None when the native library is unavailable.
    """
    import ctypes

    from perphil_tpu import _native

    lib = _native.load()
    if lib is None:
        return None
    A = A.tocsr().copy()
    A.sort_indices()
    n = A.shape[0]
    if A.nnz >= 2**31 or n >= 2**31:
        # int32 indices would wrap; the published sizes never get here, but
        # fall back to the factorize-per-call int64 path rather than corrupt
        return lambda b: native_ilu_gmres(
            A, b, rtol=rtol, atol=atol, restart=restart, max_it=max_it
        )[:3]
    av = np.ascontiguousarray(A.data, dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)

    def _d(a):
        return a.ctypes.data_as(dp)

    # int32 indices (PETSc's default PetscInt): 33% less index traffic in
    # the memory-bound SpMV/trisolve
    ai32 = A.indptr.astype(np.int32)
    aj32 = A.indices.astype(np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)

    def _i32(a):
        return a.ctypes.data_as(i32p)

    fv = av.copy()
    diag = np.zeros(n, dtype=np.int32)
    rc = lib.csr_ilu0_factorize_i32(n, _i32(ai32), _i32(aj32), _d(fv), _i32(diag))
    if rc != 0:
        raise ZeroDivisionError("ILU(0): zero or missing pivot")

    def solve(b: np.ndarray):
        x = np.zeros(n, dtype=np.float64)
        rnorm = np.zeros(1, dtype=np.float64)
        bb = np.ascontiguousarray(b, dtype=np.float64)
        its = lib.csr_gmres_ilu_i32(
            n, _i32(ai32), _i32(aj32), _d(av),
            _i32(ai32), _i32(aj32), _d(fv), _i32(diag),
            _d(bb), float(rtol), float(atol), restart, max_it,
            _d(x), _d(rnorm), ctypes.cast(None, dp),
        )
        return int(its), x, float(rnorm[0])

    return solve


def drand48_weights(n: int, x0: int = 0x1234ABCD330E) -> np.ndarray:
    """The exact drand48 LCG sequence from its documented default state —
    what PETSc's ``PetscRandom`` (rander48) hands MATCOLORINGGREEDY as
    vertex weights when no seed is set."""
    a, c, m = 0x5DEECE66D, 0xB, 1 << 48
    out = np.empty(n)
    x = x0
    for i in range(n):
        x = (a * x + c) % m
        out[i] = x / m
    return out


def petsc_rander48_weights(n: int) -> np.ndarray:
    """The rander48 sequence from PETSc's default PetscRandom seed
    (``0x12345678``, seeded srand48-style: state ``(seed << 16) | 0x330E``).
    This is the weight draw behind the pinned NGS coloring
    (``ngs_parity_coloring``)."""
    return drand48_weights(n, (0x12345678 << 16) | 0x330E)


def _quad_cells(mesh: StructuredMesh) -> np.ndarray:
    """Global vertex ids of every quad cell, counterclockwise cyclic order
    (DMPlex closure order for an oriented quad), cells lexicographic with x
    fastest. Vertex ids are the lexicographic flat index ``j*(nx+1)+i``."""
    nx, ny = mesh.cells
    s = nx + 1
    j, i = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    v00 = (j * s + i).ravel()
    return np.stack([v00, v00 + 1, v00 + s + 1, v00 + s], axis=1)


def quad_cell_cm_parity(mesh: StructuredMesh) -> np.ndarray:
    """The pinned quad-mesh vertex numbering behind the reference's SNES
    NGS coloring: unreversed Cuthill-McKee on the quad cell dual graph
    rooted at the ``(nx-1, 0)`` corner cell, vertices numbered by first
    appearance in the reordered cell traversal (counterclockwise closure
    order within each cell). The quad analogue of ``cell_rcm_parity`` —
    same corner-cell root family, unreversed direction; pinned by the
    systematic draw search recorded in
    ``results-conforming-2d/ordering/ngs_coloring.csv`` (the only draw of
    56 numbering x weight x seed candidates matching both N=4 and N=8, and
    then every published size). Returns ``perm`` with
    ``perm[new_index] = old_lexicographic_index``."""
    nv = mesh.num_vertices
    cells = _quad_cells(mesh)
    G = _cell_dual_graph(cells, 2)
    root = mesh.cells[0] - 1  # cell (nx-1, 0) in lexicographic cell order
    corder = _cm_from_root(G, int(root), reverse=False)
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


def ngs_parity_coloring(mesh: StructuredMesh) -> np.ndarray:
    """The pinned SNES-NGS coloring draw reproducing the reference's
    published Picard counts 16/63/194/635/1673/5135 at N=4..128 EXACTLY
    (``petsc_perf_breakdown-with-picard.csv``, "Scaling-Splitting Picard
    with MUMPS" rows).

    PETSc's SNES ``ngs`` colors the Jacobian pattern with a randomized
    distance-1 greedy/Jones-Plassmann coloring (for distance 1 the two are
    identical: color(v) = mex over higher-weighted neighbors). The draw is
    fully determined by (a) the weight sequence — PETSc's rander48 stream
    from its default seed, ``petsc_rander48_weights`` — and (b) the row
    numbering the weights are dealt along — Firedrake/DMPlex's reordered
    numbering, emulated by ``quad_cell_cm_parity`` + field-major blocking.
    Both were pinned by a systematic search over the faithful candidate
    space (two seeds x 20 numberings x 4 weight variants, filtered on the
    published N=4 and N=8 counts: exactly one survivor, which then matched
    N=16/32/64/128 with no further freedom).

    Returns per-DoF colors (shape ``(2*num_vertices,)``, field-major
    monolithic layout, int32). Sweeping colors in ascending order with
    simultaneous secant updates (``colored_ngs_sweeps``, or the production
    ``ColoredNGSSweeper``) reproduces the reference trajectory: for the
    linear DPP residual PETSc's secant slope is exactly the diagonal.
    Quad meshes only (the only element the reference publishes Picard
    counts for)."""
    if mesh.element != "quad":
        raise ValueError(
            f"ngs_parity_coloring is pinned for quad meshes, got {mesh.element!r}"
        )
    nv = mesh.num_vertices
    n = 2 * nv
    perm2 = blocked(quad_cell_cm_parity(mesh))
    # full structural monolithic pattern: every field pair couples through
    # the 9-point vertex envelope (envelope == FE pattern on quads)
    nx, ny = mesh.cells
    sx, sy = nx + 1, ny + 1
    j, i = np.divmod(np.arange(nv), sx)
    rows_, cols_ = [], []
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            ok = (i + di >= 0) & (i + di < sx) & (j + dj >= 0) & (j + dj < sy)
            r = np.flatnonzero(ok)
            c = r + dj * sx + di
            rows_.append(r)
            cols_.append(c)
    rr = np.concatenate(rows_)
    cc = np.concatenate(cols_)
    Gv = sp.csr_matrix((np.ones(rr.shape[0]), (rr, cc)), shape=(nv, nv))
    G = sp.bmat([[Gv, Gv], [Gv, Gv]], format="csr")
    Gp = G[perm2][:, perm2].tocsr()
    w = petsc_rander48_weights(n)
    order = np.argsort(w, kind="stable")[::-1]
    colors_new = greedy_coloring(Gp, order)
    colors = np.empty(n, dtype=np.int32)
    colors[perm2] = colors_new
    return colors


def greedy_coloring(A: sp.spmatrix, order: np.ndarray) -> np.ndarray:
    """Greedy distance-1 coloring processing vertices in ``order``
    (PETSc MATCOLORINGGREEDY processes largest weight first)."""
    A = A.tocsr()
    n = A.shape[0]
    colors = -np.ones(n, dtype=np.int64)
    indptr, indices = A.indptr, A.indices
    for v in order:
        used = set()
        for j in indices[indptr[v] : indptr[v + 1]]:
            if j != v and colors[j] >= 0:
                used.add(colors[j])
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def colored_ngs_sweeps(
    A: sp.csr_matrix,
    b: np.ndarray,
    x0: np.ndarray,
    colors: np.ndarray,
    rtol: float = 1e-8,
    atol: float = 1e-12,
    stol: float = 0.0,
    max_it: int = 30000,
) -> int:
    """Multicolor Gauss-Seidel sweep count with PETSc
    SNESComputeNGSDefaultSecant semantics: for each color in ascending
    index, update every DoF of that color simultaneously by a secant step
    on the CURRENT residual (for a linear residual the secant slope is
    exactly the diagonal). One SNES 'ngs' iteration == one full pass over
    the colors. Stops on SNESConvergedDefault criteria.

    PETSc's coloring is randomized (drand48 weights, ``drand48_weights``)
    and the reference CSVs do not record the draw; re-draws with faithful
    weight/pattern variants bracket the published Picard counts within
    ~10% at small N and within 1.2% at N=128
    (see ``experiments/ordering_study.py`` and
    ``results-conforming-2d/ordering/ngs_coloring.csv``).
    """
    A = A.tocsr()
    x = x0.astype(np.float64).copy()
    diag = A.diagonal()
    fnorm0 = np.linalg.norm(b - A @ x)
    ncolors = int(colors.max()) + 1
    masks = [colors == c for c in range(ncolors)]
    for it in range(1, max_it + 1):
        xold = x.copy()
        for m in masks:
            r = b - A @ x
            x[m] += r[m] / diag[m]
        fnorm = np.linalg.norm(b - A @ x)
        if fnorm <= atol or fnorm <= rtol * fnorm0:
            return it
        if stol and np.linalg.norm(x - xold) <= stol * np.linalg.norm(x):
            return it
    return max_it


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
    ||dx|| < stol*||x|| (PETSc snes_stol, default 1e-8).

    Dispatches to the native kernel (``csrc/csr_solver.cpp::csr_gs_sweeps``)
    when available — the sweep is inherently sequential, and the pure-Python
    fallback below is impractical beyond ~10k DoF."""
    import ctypes

    from perphil_tpu import _native

    A = A.tocsr()
    A.sort_indices()
    lib = _native.load()
    if lib is not None:
        indptr = np.ascontiguousarray(A.indptr, dtype=np.int64)
        indices = np.ascontiguousarray(A.indices, dtype=np.int64)
        data = np.ascontiguousarray(A.data, dtype=np.float64)
        bb = np.ascontiguousarray(b, dtype=np.float64)
        x = np.ascontiguousarray(x0, dtype=np.float64).copy()
        i64p = ctypes.POINTER(ctypes.c_int64)
        dp = ctypes.POINTER(ctypes.c_double)
        return int(
            lib.csr_gs_sweeps(
                A.shape[0],
                indptr.ctypes.data_as(i64p), indices.ctypes.data_as(i64p),
                data.ctypes.data_as(dp), bb.ctypes.data_as(dp),
                x.ctypes.data_as(dp), rtol, atol, stol, max_it,
            )
        )
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
