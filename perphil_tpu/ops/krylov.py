"""JAX-native Krylov solvers: restarted GMRES and CG.

The TPU replacement for PETSc's KSP (``ksp_type: gmres`` presets at
``/root/reference/src/perphil/solvers/parameters.py:12-27``). Semantics match
PETSc so iteration counts reproduce:

  - GMRES restarts every 30 iterations (PETSc default ``ksp_gmres_restart``),
  - classical Gram-Schmidt orthogonalization (PETSc default),
  - left preconditioning with the preconditioned-residual norm,
  - default convergence test ``rnorm <= max(rtol * rnorm0, atol)`` with
    ``rnorm0`` the initial (preconditioned) residual norm, and divergence
    at ``rnorm > 1e5 * rnorm0`` (``KSPConvergedDefault``),
  - iteration counts reported like ``ksp.getIterationNumber()``
    (``solvers/solver.py:73-74``).

Everything is ``lax.while_loop``-based with static shapes: the Krylov basis
is a fixed ``(restart+1, n)`` buffer whose unused rows stay zero, so the
classical Gram-Schmidt projection is a single ``V @ w`` matvec — an
MXU-friendly tall-matrix product.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# PETSc's KSPConvergedDefault divergence tolerance (divtol) default.
DEFAULT_DTOL = 1.0e4

Array = jnp.ndarray
Op = Callable[[Array], Array]


class KrylovResult(NamedTuple):
    x: Array
    iterations: Array  # int
    residual_norm: Array  # float
    converged: Array  # bool


def _identity(v: Array) -> Array:
    return v


def gmres(
    A: Op,
    b: Array,
    x0: Optional[Array] = None,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 10000,
    restart: int = 30,
    M_inv: Optional[Op] = None,
    dtol: float = DEFAULT_DTOL,
    reorthogonalize: Optional[bool] = None,
) -> KrylovResult:
    """Left-preconditioned restarted GMRES, PETSc-compatible.

    :param A: matrix-free operator (flat vector -> flat vector).
    :param b: right-hand side (flat).
    :param M_inv: left preconditioner application (None = identity).
    :param reorthogonalize: CGS2 (second Gram-Schmidt pass). Default: on
        for TPU-class backends (whose in-loop f64 reductions are noisy),
        off on CPU — matching PETSc's plain-CGS default there.
    :returns: KrylovResult(x, iterations, residual_norm, converged).
    """
    if reorthogonalize is None:
        try:
            reorthogonalize = jax.default_backend().lower() in ("tpu", "axon")
        except Exception:
            reorthogonalize = False
    P = M_inv or _identity
    dtype = b.dtype
    m = int(restart)
    x0 = jnp.zeros_like(b) if x0 is None else x0

    # Shape-general: b may be a flat vector or a stacked grid (e.g.
    # (2, nz, ny, nx) for two sharded pressure fields) — the Krylov basis
    # keeps the operand's shape so device shardings propagate untouched.
    nd = b.ndim
    op_axes = (tuple(range(1, nd + 1)), tuple(range(nd)))

    def basis_dot(V, w):  # (m+1, *shape) x (*shape) -> (m+1,)
        return jnp.tensordot(V, w, axes=op_axes)

    def basis_comb(h, V):  # (m+1,) x (m+1, *shape) -> (*shape)
        return jnp.tensordot(h, V, axes=((0,), (0,)))

    def vnorm(v):
        return jnp.sqrt(jnp.vdot(v, v)).real

    r0 = P(b - A(x0))
    rnorm0 = vnorm(r0)
    tol = jnp.maximum(rtol * rnorm0, atol)
    div = dtol * rnorm0

    def arnoldi_step(carry):
        V, R, g, cs, sn, j, its, rnorm, x = carry
        w = P(A(V[j]))
        # classical Gram-Schmidt: unused rows of V are zero, so the full
        # products are exact projections onto the current basis.
        h = basis_dot(V, w)
        w = w - basis_comb(h, V)
        if reorthogonalize:
            # CGS2: one reorthogonalization pass restores orthogonality lost
            # to backend reduction noise (the axon TPU's in-loop f64
            # reductions carry ~1e-7-relative error, which otherwise stalls
            # tightly-preconditioned solves); spans the same Krylov space,
            # so iteration counts in clean arithmetic are unchanged.
            c = basis_dot(V, w)
            w = w - basis_comb(c, V)
            h = h + c
        hj1 = vnorm(w)
        V = V.at[j + 1].set(w / jnp.where(hj1 > 0.0, hj1, 1.0))
        # apply stored Givens rotations to column h (entries 0..j)
        def rot(i, hv):
            hi = hv[i]
            hi1 = hv[i + 1]
            keep = i < j
            new_i = jnp.where(keep, cs[i] * hi + sn[i] * hi1, hi)
            new_i1 = jnp.where(keep, -sn[i] * hi + cs[i] * hi1, hi1)
            return hv.at[i].set(new_i).at[i + 1].set(new_i1)

        hfull = h.at[jnp.minimum(j + 1, m)].set(jnp.where(j + 1 <= m, hj1, 0.0))
        hfull = lax.fori_loop(0, m, rot, hfull)
        # new rotation zeroing hfull[j+1]
        a_ = hfull[j]
        b_ = hfull[j + 1]
        denom = jnp.sqrt(a_ * a_ + b_ * b_)
        denom_safe = jnp.where(denom > 0.0, denom, 1.0)
        c_new = jnp.where(denom > 0.0, a_ / denom_safe, 1.0)
        s_new = jnp.where(denom > 0.0, b_ / denom_safe, 0.0)
        cs = cs.at[j].set(c_new)
        sn = sn.at[j].set(s_new)
        hfull = hfull.at[j].set(c_new * a_ + s_new * b_).at[j + 1].set(0.0)
        R = R.at[:, j].set(hfull[:m])
        gj = g[j]
        g = g.at[j].set(c_new * gj).at[j + 1].set(-s_new * gj)
        rnorm = jnp.abs(g[j + 1])
        return V, R, g, cs, sn, j + 1, its + 1, rnorm, x

    def cycle(state):
        x, its, rnorm, done = state
        r = P(b - A(x))
        beta = vnorm(r)
        V = jnp.zeros((m + 1,) + b.shape, dtype=dtype)
        V = V.at[0].set(r / jnp.where(beta > 0.0, beta, 1.0))
        R = jnp.zeros((m, m), dtype=dtype)
        g = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)
        cs = jnp.zeros(m, dtype=dtype)
        sn = jnp.zeros(m, dtype=dtype)

        def inner_cond(carry):
            *_, j, its_i, rnorm_i, _x = carry
            ok = (j < m) & (its_i < max_it)
            ok &= rnorm_i > jnp.maximum(tol, 0.0)
            ok &= rnorm_i <= div
            return ok

        carry = (V, R, g, cs, sn, jnp.asarray(0), its, beta, x)
        V, R, g, cs, sn, j, its, rnorm, x = lax.while_loop(
            inner_cond, arnoldi_step, carry
        )
        # solve R[:j,:j] y = g[:j]; pad unused diagonal with 1, rhs with 0
        col = jnp.arange(m)
        Rm = jnp.where((col[None, :] >= j) & (col[:, None] == col[None, :]), 1.0, R)
        Rm = jnp.where((col[None, :] >= j) & (col[:, None] != col[None, :]), 0.0, Rm)
        gm = jnp.where(col < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        x = x + basis_comb(y, V[:m])
        done = (rnorm <= tol) | (its >= max_it) | (rnorm > div)
        return x, its, rnorm, done

    def outer_cond(state):
        _, its, rnorm, done = state
        return ~done

    # handle the trivial b = 0 / already-converged case
    init_done = rnorm0 <= tol
    x, its, rnorm, _ = lax.while_loop(
        outer_cond, cycle, (x0, jnp.asarray(0), rnorm0, init_done)
    )
    return KrylovResult(x, its, rnorm, rnorm <= tol)


def cg(
    A: Op,
    b: Array,
    x0: Optional[Array] = None,
    rtol: float = 1.0e-8,
    atol: float = 1.0e-12,
    max_it: int = 10000,
    M_inv: Optional[Op] = None,
) -> Tuple[Array, Array, Array]:
    """Preconditioned conjugate gradients (for SPD operators).

    Convergence on the unpreconditioned residual 2-norm relative to the
    initial residual. Shape-agnostic: works on grid or flat arrays.
    Returns (x, iterations, residual_norm).
    """
    P = M_inv or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0

    def dot(u, v):
        return jnp.vdot(u, v)

    r = b - A(x0)
    z = P(r)
    rnorm0 = jnp.sqrt(dot(r, r)).real
    tol = jnp.maximum(rtol * rnorm0, atol)

    def cond(state):
        x, r, z, p, rz, its, rnorm = state
        return (rnorm > tol) & (its < max_it)

    def body(state):
        x, r, z, p, rz, its, rnorm = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = P(r)
        rz_new = dot(r, z)
        p = z + (rz_new / rz) * p
        rnorm = jnp.sqrt(dot(r, r)).real
        return x, r, z, p, rz_new, its + 1, rnorm

    state = (x0, r, z, z, dot(r, z), jnp.asarray(0), rnorm0)
    x, r, z, p, rz, its, rnorm = lax.while_loop(cond, body, state)
    return x, its, rnorm
