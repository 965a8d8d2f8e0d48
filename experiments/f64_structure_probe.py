"""Is PETSc-count parity robust to MY kernel's op structure in f64?

Follow-up to ``tf_grid_probe.py`` (which showed per-op f64-grid rounding
of the tf trajectory lands 39, not 40, at 2D N=8): the residual
systematic difference there was the EXACTLY-rounded dot products (a tf
tree rounded once at the end) — an accuracy-class upgrade over any real
f64 dot, which accumulates f64 roundings stepwise. The 111-cell CPU
parity record says f64-grade arithmetic is count-stable across op ORDER
(XLA's reassociations differ from PETSc's BLAS), so the hypothesis is:

    counts are a function of the ACCURACY CLASS (every op f64-grade
    faithfully rounded), robust to order within the class.

This probe computes the whole GMRES in true f64 (CPU) but with the FUSED
KERNEL's structural choices — pairwise halving-tree dots (stepwise f64
rounding per level), tree basis combination, elementwise scales — and
checks the knife-edge counts. Pass => the in-kernel ef64 mode (tf ops +
round-to-f64-grid after EVERY op, tree levels included) reproduces
PETSc's counts.

Run: JAX_PLATFORMS=cpu python experiments/f64_structure_probe.py
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax import lax


def _next_pow2(n):
    return 1 << max(0, (int(n) - 1).bit_length())


def tree_sum(p, keep_leading=0):
    """Pairwise halving-tree sum over all but the leading axes, each level
    f64-rounded — the kernel's reduction structure in f64."""
    lead = p.shape[:keep_leading]
    L = int(np.prod(p.shape[keep_leading:])) if p.ndim > keep_leading else 1
    p = p.reshape(lead + (L,))
    L2 = _next_pow2(L)
    if L2 != L:
        p = jnp.pad(p, [(0, 0)] * len(lead) + [(0, L2 - L)])
    while L2 > 1:
        half = L2 // 2
        p = p[..., :half] + p[..., half:]
        L2 = half
    return p[..., 0]


def gmres_f64_struct(A, b, x0, rtol, atol, max_it, restart):
    """Restarted GMRES in f64 with halving-tree reductions (the fused
    kernel's structure); same stopping semantics as gmres_df."""
    from perphil_tpu.ops.krylov import DEFAULT_DTOL, KrylovResult

    m = int(restart)
    shape = b.shape

    def basis_dot(V, w):
        return tree_sum(V * w[None], keep_leading=1)

    def basis_comb(h, V):
        t = h.reshape((-1,) + (1,) * b.ndim) * V
        return tree_sum(jnp.moveaxis(t, 0, -1), keep_leading=b.ndim)

    def vnorm(v):
        return jnp.sqrt(tree_sum(v * v))

    def _residual(x):
        return b - A(x)

    r0 = _residual(x0)
    rnorm0 = vnorm(r0)
    tol = jnp.maximum(rtol * rnorm0, atol)
    div = DEFAULT_DTOL * rnorm0

    def cycle(state):
        x, its, rnorm, done = state
        r = _residual(x)
        beta = vnorm(r)
        inv = jnp.where(beta > 0.0, 1.0 / beta, 1.0)
        v0 = r * inv
        V = jnp.zeros((m + 1,) + shape, dtype=b.dtype).at[0].set(v0)
        R = jnp.zeros((m, m), dtype=jnp.float64)
        g = jnp.zeros(m + 1, dtype=jnp.float64).at[0].set(beta)
        cs = jnp.zeros(m, dtype=jnp.float64)
        sn = jnp.zeros(m, dtype=jnp.float64)

        def inner_cond(carry):
            *_, j, its_i, rnorm_i, _x = carry
            ok = (j < m) & (its_i < max_it)
            ok &= rnorm_i > jnp.maximum(tol, 0.0)
            ok &= rnorm_i <= div
            return ok

        def arnoldi_step(carry):
            from perphil_tpu.ops.krylov import _apply_rotations_scanned

            V, R, g, cs, sn, j, its_i, rnorm_i, x_i = carry
            w = A(V[j])
            h = basis_dot(V, w)
            w = w - basis_comb(h, V)
            hj1 = vnorm(w)
            inv = jnp.where(hj1 > 0.0, 1.0 / hj1, 1.0)
            V = V.at[j + 1].set(w * inv)
            hfull = h.at[jnp.minimum(j + 1, m)].set(
                jnp.where(j + 1 <= m, hj1, 0.0)
            )
            hfull = _apply_rotations_scanned(hfull, cs, sn, j, m)
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
            rnorm_i = jnp.abs(g[j + 1])
            return V, R, g, cs, sn, j + 1, its_i + 1, rnorm_i, x_i

        carry = (V, R, g, cs, sn, jnp.asarray(0), its, beta, x)
        V, R, g, cs, sn, j, its, rnorm, x = lax.while_loop(
            inner_cond, arnoldi_step, carry
        )
        col = jnp.arange(m)
        Rm = jnp.where(
            (col[None, :] >= j) & (col[:, None] == col[None, :]), 1.0, R
        )
        Rm = jnp.where(
            (col[None, :] >= j) & (col[:, None] != col[None, :]), 0.0, Rm
        )
        gm = jnp.where(col < j, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        x = x + basis_comb(y, V[:m])
        done = (
            (rnorm <= tol)
            | (its >= max_it)
            | (rnorm > div)
            | ~jnp.isfinite(rnorm)
            | (j == 0)
        )
        return x, its, rnorm, done

    init_done = rnorm0 <= tol
    x, its, rnorm, _ = lax.while_loop(
        lambda s: ~s[3], cycle, (x0, jnp.asarray(0), rnorm0, init_done)
    )
    return KrylovResult(x, its, rnorm, rnorm <= tol)


def run_cell(label, op, g1, g2, expected):
    b1, b2 = op.lifted_rhs(g1, g2)
    b = jnp.stack([b1, b2])
    bdry = jnp.asarray(op._mask_arrays[0])
    x0 = jnp.stack([jnp.where(bdry, g1, 0.0), jnp.where(bdry, g2, 0.0)])

    def A(z):
        y1, y2 = op.matvec(z[0], z[1])
        return jnp.stack([y1, y2])

    res = gmres_f64_struct(A, b, x0, 1.0e-8, 1.0e-12, 50000, 30)
    its = int(res.iterations)
    ok = "OK " if its == expected else "DRIFT"
    print(f"{label}: its={its} (PETSc {expected}) {ok}")
    return its


def main():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from tf_grid_probe import build_cell_2d, build_cell_3d

    op, g1, g2 = build_cell_2d(8)
    run_cell("2D N=8 plain GMRES  [f64 + kernel structure]", op, g1, g2, 40)
    op3, h1, h2 = build_cell_3d(4)
    run_cell("3D nx=4 plain GMRES [f64 + kernel structure]", op3, h1, h2, 27)


if __name__ == "__main__":
    main()
