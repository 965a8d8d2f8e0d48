"""Parallel-prefix triangular solves vs brute-force sequential recurrences."""

import numpy as np
import jax.numpy as jnp
import pytest

from perphil_tpu.ops.partri import (
    AffineChainScan,
    GridTriSolve2D,
    GridTriSolve3D,
    apply_varcoef_stencil,
)

# slow: parallel-prefix trisolve trees (heavy on CPU); run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 9, 17, 40])
@pytest.mark.parametrize("scalar", [True, False])
def test_affine_chain_scan(n, scalar):
    rng = np.random.default_rng(n)
    m = 4
    if scalar:
        M = rng.standard_normal((n, 3)) * 0.5
        g = rng.standard_normal((n, 3))
    else:
        M = rng.standard_normal((n, 3, m, m)) * 0.3
        g = rng.standard_normal((n, 3, m))
    chain = AffineChainScan(jnp.asarray(M), scalar=scalar)
    x = np.asarray(chain.apply(jnp.asarray(g)))

    ref = np.zeros_like(g)
    for t in range(n):
        prev = ref[t - 1] if t > 0 else np.zeros_like(g[0])
        if scalar:
            ref[t] = (M[t] * prev if t > 0 else 0.0) + g[t]
        else:
            ref[t] = (np.einsum("bij,bj->bi", M[t], prev) if t > 0 else 0.0) + g[t]
    np.testing.assert_allclose(x, ref, rtol=1e-10, atol=1e-12)


def _brute_2d(c, wr, bm, b0, bp):
    ny, nx = c.shape[-2:]
    x = np.zeros_like(c)
    for y in range(ny):
        for i in range(nx):
            v = c[..., y, i].copy()
            if i > 0:
                v += wr[..., y, i] * x[..., y, i - 1]
            if y > 0:
                if i > 0:
                    v += bm[..., y, i] * x[..., y - 1, i - 1]
                v += b0[..., y, i] * x[..., y - 1, i]
                if i < nx - 1:
                    v += bp[..., y, i] * x[..., y - 1, i + 1]
            x[..., y, i] = v
    return x


@pytest.mark.parametrize("shape", [(1, 1), (3, 4), (5, 5), (9, 7), (17, 12)])
@pytest.mark.parametrize("batch", [(), (3,)])
def test_grid_tri_solve_2d(shape, batch):
    ny, nx = shape
    rng = np.random.default_rng(ny * 100 + nx)
    full = batch + (ny, nx)
    wr = rng.standard_normal(full) * 0.4
    bm = rng.standard_normal(full) * 0.4
    b0 = rng.standard_normal(full) * 0.4
    bp = rng.standard_normal(full) * 0.4
    # zero out-of-range couplings as the factor arrays guarantee
    wr[..., :, 0] = 0.0
    bm[..., 0, :] = 0.0
    bm[..., :, 0] = 0.0
    b0[..., 0, :] = 0.0
    bp[..., 0, :] = 0.0
    bp[..., :, -1] = 0.0
    c = rng.standard_normal(full)

    solver = GridTriSolve2D(*(jnp.asarray(a) for a in (wr, bm, b0, bp)))
    x = np.asarray(solver.apply(jnp.asarray(c)))
    np.testing.assert_allclose(x, _brute_2d(c, wr, bm, b0, bp), rtol=1e-9, atol=1e-11)


def test_grid_tri_solve_3d():
    nz, ny, nx = 4, 5, 6
    rng = np.random.default_rng(7)
    shape = (nz, ny, nx)

    def coef():
        return rng.standard_normal(shape) * 0.3

    wr, bm, b0, bp = coef(), coef(), coef(), coef()
    wr[..., :, 0] = 0.0
    bm[..., 0, :] = 0.0
    bm[..., :, 0] = 0.0
    b0[..., 0, :] = 0.0
    bp[..., 0, :] = 0.0
    bp[..., :, -1] = 0.0
    bz = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = coef()
            if dy < 0:
                w[:, 0, :] = 0.0
            if dy > 0:
                w[:, -1, :] = 0.0
            if dx < 0:
                w[:, :, 0] = 0.0
            if dx > 0:
                w[:, :, -1] = 0.0
            w[0] = 0.0  # plane 0 has no predecessor
            bz[(dx, dy)] = w

    plane2d = GridTriSolve2D(*(jnp.asarray(a) for a in (wr, bm, b0, bp)))
    solver = GridTriSolve3D(plane2d, {k: jnp.asarray(v) for k, v in bz.items()})
    c = rng.standard_normal(shape)
    x = np.asarray(solver.apply(jnp.asarray(c)))

    # brute force: sequential over planes; within-plane sequential 2D
    ref = np.zeros(shape)
    for z in range(nz):
        cz = c[z].copy()
        if z > 0:
            for (dx, dy), w in bz.items():
                shifted = np.zeros((ny, nx))
                ys = slice(max(dy, 0), ny + min(dy, 0))
                xs = slice(max(dx, 0), nx + min(dx, 0))
                ys_src = slice(max(-dy, 0), ny + min(-dy, 0))
                xs_src = slice(max(-dx, 0), nx + min(-dx, 0))
                shifted[ys_src, xs_src] = ref[z - 1][ys, xs]
                cz += w[z] * shifted
        ref[z] = _brute_2d(cz, wr[z], bm[z], b0[z], bp[z])
    np.testing.assert_allclose(x, ref, rtol=1e-8, atol=1e-10)


def test_apply_varcoef_stencil():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 6))
    coeffs = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = rng.standard_normal((5, 6))
            if dy < 0:
                w[0, :] = 0.0
            if dy > 0:
                w[-1, :] = 0.0
            if dx < 0:
                w[:, 0] = 0.0
            if dx > 0:
                w[:, -1] = 0.0
            coeffs[(dx, dy)] = jnp.asarray(w)
    y = np.asarray(apply_varcoef_stencil(jnp.asarray(x), coeffs))
    ref = np.zeros_like(x)
    for (dx, dy), w in coeffs.items():
        shifted = np.zeros_like(x)
        ys = slice(max(dy, 0), 5 + min(dy, 0))
        xs = slice(max(dx, 0), 6 + min(dx, 0))
        ys_dst = slice(max(-dy, 0), 5 + min(-dy, 0))
        xs_dst = slice(max(-dx, 0), 6 + min(-dx, 0))
        shifted[ys_dst, xs_dst] = x[ys, xs]
        ref += np.asarray(w) * shifted
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-13)


def test_bf16_weight_dtype_keeps_f32_state_2d():
    """bf16 storage truncates only the STORED maps: the recurrence state and
    output stay f32 and the result tracks the full-precision solve."""
    from perphil_tpu.ops import partri

    ny, nx = 17, 12
    rng = np.random.default_rng(42)
    coef = lambda: rng.standard_normal((ny, nx)) * 0.3  # noqa: E731
    wr, bm, b0, bp = coef(), coef(), coef(), coef()
    wr[:, 0] = 0.0
    bm[0, :] = 0.0
    bm[:, 0] = 0.0
    b0[0, :] = 0.0
    bp[0, :] = 0.0
    bp[:, -1] = 0.0
    c = rng.standard_normal((ny, nx))
    args = tuple(jnp.asarray(a, jnp.float32) for a in (wr, bm, b0, bp))
    ref = np.asarray(GridTriSolve2D(*args).apply(jnp.asarray(c, jnp.float32)))
    with partri.weight_dtype("bfloat16"):
        solver = GridTriSolve2D(*args)
    # bf16 storage contract in whichever mode the group-size env selects
    if solver.chain is not None:
        assert solver.chain.level_mats[0][0].dtype == jnp.bfloat16
    else:
        assert solver.g_Mhat.dtype == jnp.bfloat16
    out = solver.apply(jnp.asarray(c, jnp.float32))
    assert out.dtype == jnp.float32  # state contract
    rel = float(np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)))
    assert rel < 1e-2, rel


def test_bf16_weight_dtype_3d_composes_full_precision():
    """The 3D plane-map densification must run through a full-precision
    plane solver; both stages' STORED maps end up bf16 afterwards."""
    from perphil_tpu.ops import partri

    nz, ny, nx = 4, 5, 6
    rng = np.random.default_rng(11)
    shape = (nz, ny, nx)
    coef = lambda: rng.standard_normal(shape) * 0.25  # noqa: E731
    wr, bm, b0, bp = coef(), coef(), coef(), coef()
    wr[..., :, 0] = 0.0
    bm[..., 0, :] = 0.0
    bm[..., :, 0] = 0.0
    b0[..., 0, :] = 0.0
    bp[..., 0, :] = 0.0
    bp[..., :, -1] = 0.0
    bz = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = coef()
            if dy < 0:
                w[:, 0, :] = 0.0
            if dy > 0:
                w[:, -1, :] = 0.0
            if dx < 0:
                w[:, :, 0] = 0.0
            if dx > 0:
                w[:, :, -1] = 0.0
            w[0] = 0.0
            bz[(dx, dy)] = w
    args = tuple(jnp.asarray(a, jnp.float32) for a in (wr, bm, b0, bp))
    bzj = {k: jnp.asarray(v, jnp.float32) for k, v in bz.items()}
    c = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = np.asarray(GridTriSolve3D(GridTriSolve2D(*args), bzj).apply(c))
    with partri.weight_dtype("bfloat16"):
        with partri.weight_dtype(None):
            plane = GridTriSolve2D(*args)  # full precision for densification
        solver = GridTriSolve3D(plane, bzj)
    # after construction both stages store bf16 maps
    assert solver.chain.level_mats[0][0].dtype == jnp.bfloat16
    assert solver.plane2d.chain.level_mats[0][0].dtype == jnp.bfloat16
    out = solver.apply(c)
    assert out.dtype == jnp.float32
    rel = float(np.max(np.abs(np.asarray(out) - ref)) / np.max(np.abs(ref)))
    assert rel < 1e-2, rel


def test_grouped_trisolve_matches_tree():
    """The grouped-row apply (PERPHIL_TPU_PARTRI_GROUP) solves the exact
    same recurrence as the dense-map tree: agreement to f32 roundoff at
    divisible and non-divisible ny, including wide rows."""
    import os

    from perphil_tpu.ops import partri

    rng = np.random.default_rng(11)
    for ny, nx, G in [(64, 17, 32), (257, 33, 32), (70, 9, 16)]:
        coef = lambda: jnp.asarray(  # noqa: E731
            rng.normal(0.0, 0.3, (ny, nx)).astype(np.float32)
        )
        wr, bm, b0, bp = coef(), coef(), coef(), coef()
        c = coef()
        old = os.environ.get("PERPHIL_TPU_PARTRI_GROUP")
        try:
            os.environ["PERPHIL_TPU_PARTRI_GROUP"] = "0"
            tree = partri.GridTriSolve2D(wr, bm, b0, bp)
            os.environ["PERPHIL_TPU_PARTRI_GROUP"] = str(G)
            grp = partri.GridTriSolve2D(wr, bm, b0, bp)
        finally:
            if old is None:
                os.environ.pop("PERPHIL_TPU_PARTRI_GROUP", None)
            else:
                os.environ["PERPHIL_TPU_PARTRI_GROUP"] = old
        assert grp.chain is None  # grouped mode engaged
        xt = np.asarray(tree.apply(c), np.float64)
        xg = np.asarray(grp.apply(c), np.float64)
        scale = np.max(np.abs(xt)) + 1.0
        assert np.max(np.abs(xg - xt)) / scale < 5e-6, (ny, nx, G)
