"""Which pieces of the tf knife-edge GMRES actually need ~71-bit?

The fused Pallas kernel (ops/pallas_gmres.py) carries its Hessenberg/
Givens scalar chain as SMEM double-float PAIRS (~49-bit) and its scales
(1/||w||) as df scalars. Porting the tf mode in-kernel is much cheaper if
those can STAY df while only the vector arithmetic (V planes, matvec,
CGS subtraction, x update) moves to triples.

This probe answers that on CPU (deterministic EFTs): it reruns the two
knife-edge cells (2D N=8 -> PETSc 40, 3D nx=4 -> PETSc 27) through the
public ``solve_dpp`` path with ``ops.krylov.gmres_tf`` monkeypatched to
QUANTIZE selected quantities to the df-representable value grid
(round-to-nearest two-f32 sum — the grid the in-kernel SMEM chain and df
scales live on):

  - ``scalars``: every Hessenberg projection handed to the scalar chain
    and the chain's own stores (rotated h, cs/sn, g, rnorm, norms, y)
  - ``scales``: the 1/beta and 1/||w|| normalization factors (applied to
    tf vectors at full per-component accuracy, but with a 49-bit VALUE —
    exactly what an in-kernel ``_tf_scale_df`` would do)

Run: JAX_PLATFORMS=cpu python experiments/tf_quantize_probe.py
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax import lax

QUANT = {"scalars": False, "scales": False}


def df_quant(x):
    """Round f64 -> nearest value representable as a sum of two f32."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(jnp.float32).astype(jnp.float64)
    lo = (x - hi).astype(jnp.float32).astype(jnp.float64)
    return hi + lo


def gmres_tf_quant(
    A_tf,
    b_tf,
    x0_tf=None,
    rtol=1.0e-5,
    atol=1.0e-50,
    max_it=10000,
    restart=30,
    dtol=None,
):
    """ops/krylov.gmres_tf with the module-level QUANT knobs applied."""
    import jax.scipy.linalg as jsl

    from perphil_tpu.ops.krylov import (
        DEFAULT_DTOL,
        KrylovResult,
        _apply_rotations_scanned,
    )
    from perphil_tpu.ops.tf32 import (
        tf_add,
        tf_basis_comb,
        tf_basis_dot,
        tf_norm,
        tf_scale64,
        tf_sub,
    )

    qs = df_quant if QUANT["scalars"] else (lambda x: x)
    qc = df_quant if QUANT["scales"] else (lambda x: x)
    if dtol is None:
        dtol = DEFAULT_DTOL

    m = int(restart)
    shape = b_tf[0].shape
    f32 = b_tf[0].dtype
    if x0_tf is None:
        z = jnp.zeros(shape, dtype=f32)
        x0_tf = (z, z, z)

    def _residual(x_tf):
        return tf_sub(b_tf, A_tf(x_tf))

    r0 = _residual(x0_tf)
    rnorm0 = qs(tf_norm(r0))
    tol = qs(jnp.maximum(rtol * rnorm0, atol))
    div = qs(dtol * rnorm0)

    def cycle(state):
        x, its, rnorm, done = state
        r = _residual(x)
        beta = qs(tf_norm(r))
        inv = qc(jnp.where(beta > 0.0, 1.0 / beta, 1.0))
        v0 = tf_scale64(r, inv)
        V = tuple(
            jnp.zeros((m + 1,) + shape, dtype=f32).at[0].set(c) for c in v0
        )
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
            V, R, g, cs, sn, j, its_i, rnorm_i, x_i = carry
            vj = tuple(c[j] for c in V)
            w = A_tf(vj)
            h = qs(tf_basis_dot(V, w))
            w = tf_sub(w, tf_basis_comb(h, V))
            hj1 = qs(tf_norm(w))
            inv = qc(jnp.where(hj1 > 0.0, 1.0 / hj1, 1.0))
            wn = tf_scale64(w, inv)
            V = tuple(c.at[j + 1].set(wc) for c, wc in zip(V, wn))
            hfull = h.at[jnp.minimum(j + 1, m)].set(
                jnp.where(j + 1 <= m, hj1, 0.0)
            )
            hfull = qs(_apply_rotations_scanned(hfull, cs, sn, j, m))
            a_ = hfull[j]
            b_ = hfull[j + 1]
            denom = qs(jnp.sqrt(a_ * a_ + b_ * b_))
            denom_safe = jnp.where(denom > 0.0, denom, 1.0)
            c_new = qs(jnp.where(denom > 0.0, a_ / denom_safe, 1.0))
            s_new = qs(jnp.where(denom > 0.0, b_ / denom_safe, 0.0))
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hfull = (
                hfull.at[j].set(qs(c_new * a_ + s_new * b_)).at[j + 1].set(0.0)
            )
            R = R.at[:, j].set(hfull[:m])
            gj = g[j]
            g = g.at[j].set(qs(c_new * gj)).at[j + 1].set(qs(-s_new * gj))
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
        y = qs(jsl.solve_triangular(Rm, gm, lower=False))
        Vm = tuple(c[:m] for c in V)
        x = tf_add(x, tf_basis_comb(y, Vm))
        done = (
            (rnorm <= tol)
            | (its >= max_it)
            | (rnorm > div)
            | ~jnp.isfinite(rnorm)
            | (j == 0)
        )
        return x, its, rnorm, done

    def outer_cond(state):
        return ~state[3]

    init_done = rnorm0 <= tol
    x, its, rnorm, _ = lax.while_loop(
        outer_cond, cycle, (x0_tf, jnp.asarray(0), rnorm0, init_done)
    )
    return KrylovResult(x, its, rnorm, rnorm <= tol)


def clear_solver_caches():
    import perphil_tpu.solvers.solver as S

    for name in (
        "_build_host_parity_ilu_solver",
        "_build_linear_solver",
        "_build_tensor_linear_solver",
        "_build_simplex_p2_linear_solver",
        "_build_nonlinear_solver",
    ):
        getattr(S, name).cache_clear()


def main():
    import perphil_tpu.ops.krylov as K
    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.mesh import create_cube_mesh, create_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    import perphil_tpu.solvers.parameters as sp
    from perphil_tpu.utils.manufactured_solutions import (
        exact_expressions,
        exact_expressions_3d,
    )

    K.gmres_tf = gmres_tf_quant  # builders import it from the module at build time

    params = DPPParameters()

    def cell_2d():
        mesh = create_mesh(8, 8)
        _, V = create_function_spaces(mesh)
        W = mixed_space(V)
        _, p1e, _, p2e = exact_expressions(mesh, params)
        bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
        return W, bcs

    def cell_3d():
        mesh = create_cube_mesh(4, 4, 4)
        _, V = create_function_spaces(mesh)
        W = mixed_space(V)
        _, q1e, _, q2e = exact_expressions_3d(mesh, params)
        bcs = [DirichletBC(W.sub(0), q1e), DirichletBC(W.sub(1), q2e)]
        return W, bcs

    for label, builder, expected in (
        ("2D N=8 plain GMRES", cell_2d, 40),
        ("3D nx=4 plain GMRES", cell_3d, 27),
    ):
        print(f"--- {label} (PETSc: {expected}) ---")
        for scalars in (False, True):
            for scales in (False, True):
                QUANT["scalars"] = scalars
                QUANT["scales"] = scales
                clear_solver_caches()
                W, bcs = builder()
                sol = solve_dpp(
                    W, params, bcs, solver_parameters=sp.PLAIN_GMRES_PARAMS
                )
                its = int(sol.iteration_number)
                tag = (
                    f"scalars={'df ' if scalars else 'f64'} "
                    f"scales={'df ' if scales else 'f64'}"
                )
                ok = "OK " if its == expected else "DRIFT"
                print(f"  {tag}  its={its:4d}  {ok}")


if __name__ == "__main__":
    main()
