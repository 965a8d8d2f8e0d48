"""Fused Pallas GMRES cycle kernel (``ops/pallas_gmres``).

Runs in Pallas interpret mode on CPU, compiled with
``eft_safe_compiler_options()``: XLA:CPU's fusion-duplication + LLVM FMA
contraction otherwise breaks the double-float EFTs (see the hazard note in
``ops/df32``), which is a CPU-jit artifact, not a kernel property.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC, DPPOperator
from perphil_tpu.ops.df32 import df_from_f64, eft_safe_compiler_options
from perphil_tpu.ops.dfvec import df_norm, df_vec_sub
from perphil_tpu.utils.manufactured_solutions import exact_expressions

# slow: interpret-mode whole-solve kernel validation; run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow



def _setup(N):
    params = DPPParameters()
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions(mesh, params)
    op = DPPOperator(W, params)
    g1 = jnp.asarray(DirichletBC(W.sub(0), p1e).grid_values(mesh))
    g2 = jnp.asarray(DirichletBC(W.sub(1), p2e).grid_values(mesh))
    g1d, g2d = df_from_f64(g1), df_from_f64(g2)
    b1, b2 = op.lifted_rhs_df(g1d, g2d)
    b = (jnp.stack([b1[0], b2[0]]), jnp.stack([b1[1], b2[1]]))
    bdry = jnp.asarray(op._mask_arrays[0])
    x01 = (jnp.where(bdry, g1d[0], 0.0), jnp.where(bdry, g1d[1], 0.0))
    x02 = (jnp.where(bdry, g2d[0], 0.0), jnp.where(bdry, g2d[1], 0.0))
    x0 = (jnp.stack([x01[0], x02[0]]), jnp.stack([x01[1], x02[1]]))
    return op, b, x0


def test_one_cycle_estimate_matches_true_residual():
    """The kernel's Givens residual estimate after one GMRES(30) cycle must
    equal the true residual ||b - A x_1|| (self-consistency of the
    R/g/y/update chain) — the property that exposed the CPU EFT hazard.
    One cycle is forced via max_it=restart with rtol=atol=0 (no
    convergence exit) and a huge dtol (no divergence exit). Small
    restart/N: Pallas interpret mode slows steeply with both."""
    from perphil_tpu.ops.pallas_gmres import _build_cycle

    m = 5
    op, b, x0 = _setup(4)
    solve_call, geo = _build_cycle(op, m)

    def one_cycle(xh, xl, bh, bl):
        return solve_call(
            xh, xl, bh, bl,
            jnp.asarray(0, jnp.int32),
            jnp.asarray([0.0, 0.0], jnp.float32),  # rtol
            jnp.asarray([0.0, 0.0], jnp.float32),  # atol
            jnp.asarray([1e30, 0.0], jnp.float32),  # dtol
            m,
        )

    args = (geo.pack(x0[0]), geo.pack(x0[1]), geo.pack(b[0]), geo.pack(b[1]))
    # close over the packed inputs: with runtime jit arguments the CPU
    # interpret path's loop state threading degrades ~1000x (354 s vs 0.1 s
    # for the same 5 iterations, measured); constants sidestep it
    fn = (
        jax.jit(lambda: one_cycle(*args))
        .lower()
        .compile(compiler_options=eft_safe_compiler_options())
    )
    xh2, xl2, j, its, rn, conv = fn()
    assert int(j[0]) == m
    assert int(its[0]) == m
    est = float(rn[0]) + float(rn[1])
    x1 = (geo.unpack(xh2), geo.unpack(xl2))
    true = float(df_norm(df_vec_sub(b, op.stacked_matvec_df()(x1))))
    assert est > 0
    assert abs(true - est) <= 1e-6 * est


def test_fused_solve_matches_gmres_df():
    """Full fused solve == XLA-level ``gmres_df``: identical iteration
    count, matching residual and solution (both run the same df arithmetic;
    only the reduction-tree shape differs)."""
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.ops.pallas_gmres import fused_gmres_df

    op, b, x0 = _setup(4)
    mv = op.stacked_matvec_df()
    opts = eft_safe_compiler_options()
    # restart=5 -> the in-kernel outer loop runs ~10 restart cycles
    kw = dict(rtol=1e-8, atol=1e-12, max_it=100, restart=5)
    ref = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    fus = (
        jax.jit(lambda: fused_gmres_df(op, b, x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    assert int(fus.iterations) == int(ref.iterations)
    assert bool(ref.converged) and bool(fus.converged)
    # both terminate at the first iterate under tol = rtol*||r0||; the exact
    # sub-tolerance estimate differs (different df reduction-tree shapes)
    rnorm0 = float(df_norm(df_vec_sub(b, mv(x0))))
    assert float(fus.residual_norm) <= 1e-8 * rnorm0
    dx = float(df_norm(df_vec_sub(ref.x, fus.x)))
    assert dx <= 5e-9 * float(df_norm(ref.x))


def test_fused_solve_matches_gmres_df_3d_tet():
    """3D tetrahedral path of the fused kernel (z-plane-stacked packing,
    27-point stencils) against the XLA gmres_df."""
    from perphil_tpu.mesh import create_cube_mesh
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.ops.pallas_gmres import fused_gmres_df
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

    params = DPPParameters()
    mesh = create_cube_mesh(3, 3, 3, hexahedral=False)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    op = DPPOperator(W, params)
    g1 = jnp.asarray(DirichletBC(W.sub(0), p1e).grid_values(mesh))
    g2 = jnp.asarray(DirichletBC(W.sub(1), p2e).grid_values(mesh))
    b1, b2 = op.lifted_rhs_df(df_from_f64(g1), df_from_f64(g2))
    b = (jnp.stack([b1[0], b2[0]]), jnp.stack([b1[1], b2[1]]))
    bdry = jnp.asarray(op._mask_arrays[0])
    g1d, g2d = df_from_f64(g1), df_from_f64(g2)
    x01 = (jnp.where(bdry, g1d[0], 0.0), jnp.where(bdry, g1d[1], 0.0))
    x02 = (jnp.where(bdry, g2d[0], 0.0), jnp.where(bdry, g2d[1], 0.0))
    x0 = (jnp.stack([x01[0], x02[0]]), jnp.stack([x01[1], x02[1]]))
    mv = op.stacked_matvec_df()
    opts = eft_safe_compiler_options()
    kw = dict(rtol=1e-8, atol=1e-12, max_it=100, restart=5)
    ref = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    fus = (
        jax.jit(lambda: fused_gmres_df(op, b, x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    assert int(fus.iterations) == int(ref.iterations)
    assert bool(fus.converged)
    dx = float(df_norm(df_vec_sub(ref.x, fus.x)))
    assert dx <= 1e-8 * float(df_norm(ref.x))


def test_fused_ilu_gmres_matches_golden_and_xla():
    """Fused left-ILU(0)-preconditioned GMRES: reproduces the golden
    PETSc iteration count (5 at 2D N=4, reference convergence.csv) and the
    XLA ILU path's solution."""
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.ops.pallas_gmres import fused_gmres_df
    from perphil_tpu.solvers.solver import _monolithic_pc_df

    op, b, x0 = _setup(4)
    mv = op.stacked_matvec_df()
    pc_df = _monolithic_pc_df(op, {"pc_type": "ilu"})
    opts = eft_safe_compiler_options()
    kw = dict(rtol=1e-8, atol=1e-12, max_it=100, restart=30)
    ref = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, M_inv_df=pc_df, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    fus = (
        jax.jit(lambda: fused_gmres_df(op, b, x0, pc_type="ilu", **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    assert int(fus.iterations) == int(ref.iterations) == 5  # golden count
    assert bool(fus.converged)
    dx = float(df_norm(df_vec_sub(ref.x, fus.x)))
    assert dx <= 1e-8 * float(df_norm(ref.x))


@pytest.mark.parametrize("block_role", ["ilu", "lu"])
def test_fieldsplit_pc_components_reproduce_outer_signature(block_role):
    """The packed fieldsplit preconditioners — the exact component
    functions the fused kernel traces (field-block matvec, per-field ILU
    planes or fast-diag PC, coupling, inner df PCG) — reproduce the golden
    4-iteration outer fieldsplit signature when driven by the XLA gmres_df.
    (The fully fused kernels are validated on hardware: their nested
    in-kernel loops are impractically slow under Pallas interpret mode.)"""
    from jax import lax

    from perphil_tpu.ops.df32 import df_add, df_sub
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.ops.pallas_gmres import (
        _df_div,
        _df_gt,
        _df_mask,
        _df_mul,
        _df_scale,
        _df_sqrt,
        _geometry,
        _split_const,
        build_packed_coupling,
        build_packed_field_fastdiag,
        build_packed_field_ilu,
        build_packed_matvec,
        make_ilu_apply,
        two_prod,
    )

    op, b, x0 = _setup(8)
    geo = _geometry(op)
    Rp, Wp = geo.Rp, geo.Wp
    bmask_a = jnp.asarray(geo.bmask)
    if block_role == "ilu":
        (co, lvm, dgp), ilu_meta = build_packed_field_ilu(geo, op)
        ilu_apply = make_ilu_apply(ilu_meta)
        inner_rtol, inner_atol, inner_max = 1e-8, 1e-12, 50000
    else:
        fd_consts, fd_apply = build_packed_field_fastdiag(geo, op)
        inner_rtol, inner_atol, inner_max = 1e-13, 0.0, 1000
    field_mv = build_packed_matvec(geo, op, coupling=False)
    coupling = build_packed_coupling(geo, op)
    imask = jnp.asarray(geo.imask)
    bmask = jnp.asarray(geo.bmask)
    fmask = jnp.asarray(geo.fmask)

    def tdot(u, v):
        ph, pe = two_prod(u[0], v[0])
        pe = pe + u[0] * v[1] + u[1] * v[0]
        s = (ph, pe)
        R = Rp
        while R > 1:
            h = R // 2
            s = df_add((s[0][:h], s[1][:h]), (s[0][h:R], s[1][h:R]))
            R = h
        C = Wp
        while C > 1:
            h = C // 2
            s = df_add(
                (s[0][:, :h], s[1][:, :h]), (s[0][:, h:C], s[1][:, h:C])
            )
            C = h
        return s[0][0, 0], s[1][0, 0]

    def inner_pc(v):
        if block_role == "ilu":
            z = ilu_apply(v[0] + v[1], co, lvm, dgp)
        else:
            z = fd_apply(v[0] + v[1], fd_consts, bmask_a)
        return (z, jnp.zeros_like(z))

    def inner_pcg(rhs):
        rn0 = _df_sqrt(tdot(rhs, rhs))
        rt = _split_const(inner_rtol)
        at = _split_const(inner_atol)
        t_rel = _df_mul(rn0, rt)
        use_rel = _df_gt(t_rel, at)
        tol = (
            jnp.where(use_rel, t_rel[0], at[0]),
            jnp.where(use_rel, t_rel[1], at[1]),
        )
        z0 = inner_pc(rhs)
        rz0 = tdot(z0, rhs)
        zero = jnp.zeros((Rp, Wp), jnp.float32)
        done0 = jnp.where(_df_gt(rn0, tol), jnp.int32(0), jnp.int32(1))

        def body(c):
            xh, xl, rh, rl, ph, pl_, rzh, rzl, its, _d = c
            x, r, p, rz = (xh, xl), (rh, rl), (ph, pl_), (rzh, rzl)
            Ap = field_mv(p, imask, bmask, fmask)
            alpha = _df_div(rz, tdot(p, Ap))
            x = df_add(x, _df_scale(p, alpha))
            r = df_add(r, _df_scale(Ap, (-alpha[0], -alpha[1])))
            z = inner_pc(r)
            rz_new = tdot(z, r)
            beta = _df_div(rz_new, rz)
            p = df_add(z, _df_scale(p, beta))
            rn = _df_sqrt(tdot(r, r))
            done = jnp.logical_not(_df_gt(rn, tol))
            return (
                x[0], x[1], r[0], r[1], p[0], p[1], rz_new[0], rz_new[1],
                its + 1, jnp.where(done, jnp.int32(1), jnp.int32(0)),
            )

        out = lax.while_loop(
            lambda c: (c[-1] == 0) & (c[-2] < inner_max),
            body,
            (zero, zero, rhs[0], rhs[1], z0[0], z0[1], rz0[0], rz0[1],
             jnp.int32(0), done0),
        )
        return (out[0], out[1])

    def pc_df(r):
        rp = (geo.pack(r[0]), geo.pack(r[1]))
        y1 = inner_pcg(_df_mask(rp, fmask))
        r2 = df_sub(_df_mask(rp, 1.0 - fmask), coupling(y1, imask))
        zp = df_add(y1, inner_pcg(r2))
        return (geo.unpack(zp[0]), geo.unpack(zp[1]))

    mv = op.stacked_matvec_df()
    kw = dict(rtol=1e-8, atol=1e-12, max_it=50000, restart=30)
    got = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, M_inv_df=pc_df, **kw))
        .lower()
        .compile(compiler_options=eft_safe_compiler_options())
    )()
    assert int(got.iterations) == 4
    assert bool(got.converged)


def test_solver_level_fused_dispatch(monkeypatch):
    """solve_dpp routes through the fused kernel when forced (the dispatch
    in _build_linear_solver_df), reproducing the golden plain-GMRES count."""
    monkeypatch.setenv("PERPHIL_TPU_FUSED_GMRES", "force")
    monkeypatch.setenv("PERPHIL_TPU_KSP_DTYPE", "df32")
    from perphil_tpu.experiments.iterative_bench import Approach, params_for
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.solvers.solver import _build_linear_solver

    _build_linear_solver.cache_clear()  # cached solvers bake in the mode
    params = DPPParameters()
    mesh = create_mesh(4, 4)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    sol = solve_dpp(
        W, params, bcs, solver_parameters=params_for(Approach.PLAIN_GMRES)
    )
    assert sol.iteration_number == 10  # golden count (reference N=4)
    _build_linear_solver.cache_clear()


def test_fused_gmres_supported_gating(monkeypatch):
    from perphil_tpu.ops import pallas_gmres

    op, _, _ = _setup(8)
    # CPU backend: off by default, on with force
    monkeypatch.delenv("PERPHIL_TPU_FUSED_GMRES", raising=False)
    if jax.default_backend().lower() not in ("tpu", "axon"):
        assert not pallas_gmres.fused_gmres_supported(op)
    monkeypatch.setenv("PERPHIL_TPU_FUSED_GMRES", "force")
    assert pallas_gmres.fused_gmres_supported(op)
    monkeypatch.setenv("PERPHIL_TPU_FUSED_GMRES", "0")
    assert not pallas_gmres.fused_gmres_supported(op)


def test_fused_ef64_pinned_draw_n4_exact():
    """The knife-edge ef64 kernel's pinned draw (matvec=diff + CGS2) must
    land the PETSc-exact count at 2D N=4 (10 — convergence.csv row N=4).
    The razor-edge N=8 (40) and 3D nx=4 (27) cells were pinned the same
    way but take ~8 min each in interpret mode; they are covered by the
    XLA twin's fast tests (test_parity_regression) and re-measured on
    hardware in the production CSVs (_build_cycle_ef64 docstring)."""
    from perphil_tpu.ops.krylov import gmres_ef64
    from perphil_tpu.ops.pallas_gmres import fused_gmres_ef64
    from perphil_tpu.ops.tf32 import tf_from_f64

    op, _, _ = _setup(4)
    mesh = op.mesh
    # rebuild the f64 rhs/x0 exactly as the solver's ef64 route does
    params = op.params
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    _, p1e, _, p2e = exact_expressions(mesh, params)
    g1 = jnp.asarray(DirichletBC(op.W.sub(0), p1e).grid_values(mesh))
    g2 = jnp.asarray(DirichletBC(op.W.sub(1), p2e).grid_values(mesh))
    b1, b2 = op.lifted_rhs(g1, g2)
    b = jnp.stack([b1, b2])
    bdry = jnp.asarray(op._mask_arrays[0])
    x0 = jnp.stack([jnp.where(bdry, g1, 0.0), jnp.where(bdry, g2, 0.0)])
    kw = dict(rtol=1e-8, atol=1e-12, max_it=50000, restart=30)

    ref = gmres_ef64(op.stacked_matvec(), b, x0=x0, **kw)
    fus = (
        jax.jit(
            lambda: fused_gmres_ef64(
                op, tf_from_f64(b), x0_tf=tf_from_f64(x0), **kw
            )
        )
        .lower()
        .compile(compiler_options=eft_safe_compiler_options())
    )()
    assert int(ref.iterations) == 10
    assert int(fus.iterations) == 10
    x64 = sum(c.astype(jnp.float64) for c in fus.x)
    assert float(jnp.max(jnp.abs(x64 - ref.x))) <= 1e-7 * float(
        jnp.max(jnp.abs(ref.x))
    )
