"""Grouped (lane-packed) fused-GMRES geometry: XLA-level validation.

The grouped layout packs several z-planes side by side along the lane axis
(``ops/pallas_gmres._Geometry(group=G)``), shrinking the padded VPU canvas
up to ~8x on narrow 3D grids. These tests validate the layout and the
decomposed stencil shifts at the XLA level (the packed matvec is plain
jnp, runnable outside the kernel), so they are fast enough for the default
suite — the in-kernel path is covered by the slow interpret-mode tests in
``test_pallas_gmres.py`` (nx=3 tet exercises group=4; multi-block and 2D
field-lane cases below) and by the TPU profiling artifacts (nx=12:
group=8, 2 blocks, identical 465-iteration trajectory — committed in
``notebooks/results-conforming-3d/petsc_profiling/petsc_perf_breakdown_3d.csv``
and quoted in docs/benchmarks.md "Small-N cells").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from perphil_tpu.experiments.iterative_bench import default_model_params
from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
from perphil_tpu.mesh.structured import create_cube_mesh, create_mesh
from perphil_tpu.ops.assembly import DPPOperator
from perphil_tpu.ops import pallas_gmres as pg


def _op_3d(nx):
    mesh = create_cube_mesh(nx, nx, nx)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    return DPPOperator(W, default_model_params()), tuple(mesh.node_shape)


def _apply_packed(geo, mv, z):
    zp = geo.pack(z)
    out = mv(
        (zp, jnp.zeros_like(zp)),
        jnp.asarray(geo.imask),
        jnp.asarray(geo.bmask),
        jnp.asarray(geo.fmask),
    )
    return np.asarray(geo.unpack(out[0])) + np.asarray(geo.unpack(out[1]))


@pytest.mark.parametrize("nx", [4, 12])
def test_grouped_pack_roundtrip_and_matvec(nx):
    """Grouped pack/unpack round-trips, and the grouped packed matvec is
    BIT-identical to the ungrouped one (same f32 ops, relocated; the
    decomposed dz shifts land on disjoint positions so their sum is
    exact). nx=12 covers the multi-block case (group=8, 2 blocks)."""
    op, ns = _op_3d(nx)
    G = pg._plane_group(ns)
    assert G > 1, "test requires a groupable grid"
    geo1 = pg._geometry(op, group=1)
    geoG = pg._geometry(op, group=G)
    assert geoG.Rp < geo1.Rp  # the whole point

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((2,) + ns), jnp.float32)
    for geo in (geo1, geoG):
        rt = geo.unpack(geo.pack(z))
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(z))

    y1 = _apply_packed(geo1, pg.build_packed_matvec(geo1, op), z)
    yG = _apply_packed(geoG, pg.build_packed_matvec(geoG, op), z)
    np.testing.assert_array_equal(y1, yG)


def test_grouped_matvec_matches_operator():
    """Grouped packed matvec == DPPOperator.matvec (the ground truth the
    ungrouped kernel was validated against)."""
    op, ns = _op_3d(5)
    geo = pg._geometry(op, group=pg._plane_group(ns))
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((2,) + ns), jnp.float32)
    got = _apply_packed(geo, pg.build_packed_matvec(geo, op), z)
    z1, z2 = z[0].astype(jnp.float64), z[1].astype(jnp.float64)
    want = np.stack([np.asarray(v) for v in op.matvec(z1, z2)])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("N", [8, 32])
def test_field_lane_stacking_2d(N):
    """2D field-lane stacking (both field grids side by side in lanes,
    halving the canvas): pack round-trips; the packed matvec (incl. the
    lane-shift field-coupling swap) and the coupling operator are
    BIT-identical to the sublane-stacked layout."""
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    op = DPPOperator(mixed_space(V), default_model_params())
    ns = tuple(mesh.node_shape)
    geo1 = pg._geometry(op)
    geoF = pg._geometry(op, field_lanes=True)
    assert geoF.Rp == geo1.Rp // 2
    assert geoF.field_shift == (0, geoF.sw)

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((2,) + ns), jnp.float32)
    for geo in (geo1, geoF):
        np.testing.assert_array_equal(
            np.asarray(geo.unpack(geo.pack(z))), np.asarray(z)
        )
    y1 = _apply_packed(geo1, pg.build_packed_matvec(geo1, op), z)
    yF = _apply_packed(geoF, pg.build_packed_matvec(geoF, op), z)
    np.testing.assert_array_equal(y1, yF)

    def _apply_coupling(geo):
        zp = geo.pack(z)
        C = pg.build_packed_coupling(geo, op)
        out = C((zp, jnp.zeros_like(zp)), jnp.asarray(geo.imask))
        return np.asarray(geo.unpack(out[0])) + np.asarray(geo.unpack(out[1]))

    np.testing.assert_array_equal(_apply_coupling(geo1), _apply_coupling(geoF))


def test_group_choice():
    """_plane_group: narrow grids group up to the lane budget; wide or 2D
    grids stay ungrouped; ILU/fieldsplit geometries are never grouped."""
    assert pg._plane_group((13, 13, 13)) == 8  # 128 // 15
    assert pg._plane_group((17, 17, 17)) == 6
    assert pg._plane_group((5, 5, 5)) == 5  # capped at planes
    assert pg._plane_group((129, 129, 129)) == 1
    assert pg._plane_group((33, 33)) == 1

    # field-lane stacking: only wide-enough 2D canvases (N>=31: the halved
    # canvas buys >1.5x there; smaller grids keep their published
    # bit-exact trajectories), and only when both fields fit in 128 lanes
    assert pg._use_field_lanes((33, 33))
    assert not pg._use_field_lanes((17, 17))  # canvas too small
    assert not pg._use_field_lanes((65, 65))  # 2*(65+2) > 128 lanes
    assert not pg._use_field_lanes((13, 13, 13))  # 3D uses plane groups

    # 2D geometry stays single-slot regardless of the group argument
    mesh = create_mesh(8, 8)
    _, V = create_function_spaces(mesh)
    op2 = DPPOperator(mixed_space(V), default_model_params())
    geo2 = pg._geometry(op2, group=4)
    assert geo2.group == 1


# ---------------------------------------------------------------------------
# slow: IN-KERNEL interpret-mode coverage of the multi-block grouped layout
# (nblocks > 1) and the 2D field-lane layout. Production sizes hit these at
# 3D nx>=17 / 2D N>=31 — impractically large for interpret mode — so the
# layout selectors are monkeypatched onto tiny grids (the kernel supports
# any consistent group/field_lanes choice). Constant closures + eft-safe
# compile per CLAUDE.md (interpret mode is ~1000x slower with runtime
# arguments; XLA:CPU fusions break the df EFTs otherwise).


@pytest.mark.slow
def test_fused_kernel_multiblock_interpret(monkeypatch):
    import jax

    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.ops.df32 import df_from_f64, eft_safe_compiler_options
    from perphil_tpu.ops.dfvec import df_norm, df_vec_sub
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

    params = DPPParameters()
    mesh = create_cube_mesh(3, 3, 5, hexahedral=False)  # 6 z-planes
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
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

    # force group=2 -> nblocks=3 (production default would pack all 6
    # planes into one block at this width)
    monkeypatch.setattr(pg, "_plane_group", lambda ns: 2)
    geo = pg._geometry(op, group=2)
    assert geo.nblocks == 3

    mv = op.stacked_matvec_df()
    opts = eft_safe_compiler_options()
    # GMRES(5) stagnates on this system (restart too short to converge),
    # which is fine: what's under test is that the multi-block kernel
    # walks the IDENTICAL trajectory as the XLA twin — iteration count,
    # exit residual, and iterate must all agree after 60 iterations
    kw = dict(rtol=1e-6, atol=1e-12, max_it=60, restart=5)
    ref = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    fus = (
        jax.jit(lambda: pg.fused_gmres_df(op, b, x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    assert int(fus.iterations) == int(ref.iterations)
    assert bool(fus.converged) == bool(ref.converged)
    rr, rf = float(ref.residual_norm), float(fus.residual_norm)
    assert abs(rf - rr) <= 1e-5 * max(rr, 1e-30)
    dx = float(df_norm(df_vec_sub(ref.x, fus.x)))
    assert dx <= 1e-7 * max(float(df_norm(ref.x)), 1e-30)


@pytest.mark.slow
def test_fused_kernel_field_lanes_interpret(monkeypatch):
    import jax

    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.ops.df32 import df_from_f64, eft_safe_compiler_options
    from perphil_tpu.ops.dfvec import df_norm, df_vec_sub
    from perphil_tpu.ops.krylov import gmres_df
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    params = DPPParameters()
    mesh = create_mesh(4, 4)
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

    # force the field-lane layout (production gates it to N>=31 canvases)
    monkeypatch.setattr(pg, "_use_field_lanes", lambda ns: len(ns) == 2)
    geo = pg._geometry(op, field_lanes=True)
    assert geo.field_lanes

    mv = op.stacked_matvec_df()
    opts = eft_safe_compiler_options()
    kw = dict(rtol=1e-8, atol=1e-12, max_it=60, restart=5)
    ref = (
        jax.jit(lambda: gmres_df(mv, b, x0_df=x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    fus = (
        jax.jit(lambda: pg.fused_gmres_df(op, b, x0, **kw))
        .lower()
        .compile(compiler_options=opts)
    )()
    assert int(fus.iterations) == int(ref.iterations)
    assert bool(fus.converged)
    dx = float(df_norm(df_vec_sub(ref.x, fus.x)))
    assert dx <= 1e-8 * float(df_norm(ref.x))
