"""Dyadic exact tap loop in the fused-kernel matvec builders.

The fused GMRES kernels' packed matvec/coupling builders
(``ops/pallas_gmres.build_packed_matvec`` / ``build_packed_coupling``) take
a fast path when the stencils factor as ``c * dyadic + ulp-residual``
(``ops/df32.dyadic_factor``) — every pow2 term product is then exact in
f32 and needs no split-constant EFT. These tests pin (a) that the
factorization fires for EVERY uniform-grid stencil the library produces
(Q1 quad/hex and P1 tri/tet, pow2 and non-pow2 mesh sizes), with the
applied operator reproduced to sub-f64-ulp, (b) that the fast path agrees
with the f64 operator to df accuracy, and (c) that it agrees with the
general per-tap-EFT fallback (which non-dyadic stencils would take).

All at the XLA level (the packed matvec is plain jnp, runnable outside the
kernel), eager/x64 so XLA:CPU fusion cannot perturb the EFTs — the
in-kernel path is covered by the slow interpret-mode tests in
``test_pallas_gmres.py`` and by the hardware-regenerated golden CSVs.
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
from perphil_tpu.ops.df32 import dyadic_factor
from perphil_tpu.ops.stencil import compile_stencils

KINDS = {
    # non-pow2 sizes exercise the assembly-rounding residual path (3D hex
    # K at h=1/6 is 1 ulp off an exact 32x multiple) and the P1-tet noise
    # taps (~5e-18 relative, dropped)
    "2d_quad": lambda: create_mesh(12, 12),
    "2d_tri": lambda: create_mesh(12, 12, quadrilateral=False),
    "3d_hex": lambda: create_cube_mesh(6, 6, 6, hexahedral=True),
    "3d_hex_pow2": lambda: create_cube_mesh(8, 8, 8, hexahedral=True),
    "3d_tet": lambda: create_cube_mesh(6, 6, 6, hexahedral=False),
}


@pytest.mark.parametrize("kind", sorted(KINDS))
def test_library_stencils_dyadic_factor(kind):
    """Every uniform-grid K/M stencil factors (the fast path the published
    wall-clock rows run through), reproducing the operator to < 1e-13
    relative (exact up to dropped sub-noise taps)."""
    K_st, M_st = compile_stencils(KINDS[kind]())
    for st in (K_st, M_st):
        st = np.asarray(st, np.float64)
        fac = dyadic_factor(st)
        assert fac is not None
        c, D, R, terms_by_tap = fac
        back = c * D + (R if R is not None else 0.0)
        assert np.abs(back - st).max() <= 1e-13 * np.abs(st).max()
        for idx, terms in terms_by_tap.items():
            assert float(np.sum(np.asarray(terms))) == float(D[idx])
            nz = np.abs(np.asarray(terms))
            assert np.all(nz == 2.0 ** np.round(np.log2(nz)))
        assert set(terms_by_tap) == {
            tuple(i) for i in np.argwhere(D != 0.0)
        }


def test_tet_stiffness_drops_noise_taps():
    """The P1 tet stiffness stencil carries ~6 cancellation-noise taps
    (~5e-18 relative); the factoring drops them, halving the tap count."""
    K_st, _ = compile_stencils(create_cube_mesh(6, 6, 6, hexahedral=False))
    st = np.asarray(K_st, np.float64)
    c, D, R, _ = dyadic_factor(st)
    assert int((D != 0).sum()) < int((st != 0).sum())
    dropped = (st != 0) & (D == 0)
    assert np.abs(st[dropped]).max() < 1e-14 * np.abs(st).max()


def _df_matvec(geo, op, zhi, zlo):
    mv = pg.build_packed_matvec(geo, op)
    out = mv(
        (geo.pack(jnp.asarray(zhi)), geo.pack(jnp.asarray(zlo))),
        jnp.asarray(geo.imask),
        jnp.asarray(geo.bmask),
        jnp.asarray(geo.fmask),
    )
    return (
        np.asarray(geo.unpack(out[0])).astype(np.float64)
        + np.asarray(geo.unpack(out[1])).astype(np.float64)
    )


@pytest.mark.parametrize("kind", sorted(KINDS))
def test_dyadic_matvec_matches_f64_operator_and_fallback(kind):
    mesh = KINDS[kind]()
    _, V = create_function_spaces(mesh)
    op = DPPOperator(mixed_space(V), default_model_params())
    ns = tuple(mesh.node_shape)
    geo = pg._geometry(op, group=pg._plane_group(ns))

    rng = np.random.default_rng(0)
    zf64 = rng.standard_normal((2,) + ns)
    zhi = zf64.astype(np.float32)
    zlo = (zf64 - zhi.astype(np.float64)).astype(np.float32)
    want = np.stack(
        [np.asarray(v) for v in op.matvec(jnp.asarray(zf64[0]), jnp.asarray(zf64[1]))]
    )
    scale = np.abs(want).max()

    got_fast = _df_matvec(geo, op, zhi, zlo)
    orig = pg.dyadic_factor
    pg.dyadic_factor = lambda s: None  # force the per-tap-EFT fallback
    try:
        got_general = _df_matvec(geo, op, zhi, zlo)
    finally:
        pg.dyadic_factor = orig

    # df-accuracy against the true f64 operator (f32 alone would be ~1e-7)
    assert np.abs(got_fast - want).max() / scale < 5e-14
    assert np.abs(got_general - want).max() / scale < 5e-14
    # and the two paths agree with each other to the same class
    assert np.abs(got_fast - got_general).max() / scale < 5e-14
