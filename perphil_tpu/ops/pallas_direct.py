"""Fused whole-solve direct (fast-diagonalization) kernel for small meshes.

The "MUMPS role" solve (reference ``pc_factor_mat_solver_type: mumps``,
``/root/reference/src/perphil/solvers/parameters.py:4-9``) at small N is
sequencing-bound on this backend, exactly like small-N GMRES (see
``ops/pallas_gmres`` for the measured XLA step-cost model): the
mixed-precision fast-diag solve is ~50-100 XLA fusions (transforms, 2x2
mode solves, five double-float refinement residuals), which costs more than
the reference's entire sparse LU at 3D nx=4-8. This module runs the ENTIRE
mixed-precision direct solve as ONE Pallas kernel:

  1. f32 tensor fast-diagonalization (``ops/direct.py`` semantics): per-
     field interior blocks are extracted from the packed ``(Rp, 128)``
     layout, transformed per axis — x/y via small constant matmuls on the
     MXU, z via constant-weighted plane combinations — the coupled 2-field
     system solved in closed form per eigenmode, and transformed back;
  2. five double-float refinement steps using the shared packed stencil
     matvec (``ops/pallas_gmres.build_packed_matvec``), reaching ~1e-12
     relative accuracy like ``ops/mixed.MixedPrecisionDPPDirect``.

Eigen-data (1D eigenvectors, per-mode 2x2 coefficients) is computed on the
host once per (mesh, params) and baked into the kernel as constants.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from perphil_tpu.ops.df32 import df_add, df_sub
from perphil_tpu.ops.pallas_gmres import (
    _HAS_PLTPU,
    _geometry,
    _overlay_block,
    build_packed_matvec,
    pltpu,
)
from jax.experimental import pallas as pl

_VMEM_LIMIT = int(
    os.environ.get("PERPHIL_TPU_FUSED_DIRECT_VMEM_LIMIT", str(100 * 1024 * 1024))
)
_MAX_RP = int(os.environ.get("PERPHIL_TPU_FUSED_DIRECT_MAX_RP", "512"))


def fused_direct_supported(op) -> bool:
    """Whether the fused direct kernel covers this operator.

    Small tensor-product (quad/hex) meshes only — larger meshes are compute-
    bound and already far ahead of the reference on the XLA path. Default-on
    only on TPU-class backends (CPU would run Pallas interpret mode);
    ``PERPHIL_TPU_FUSED_DIRECT=force`` opts in for validation."""
    env = os.environ.get("PERPHIL_TPU_FUSED_DIRECT", "1").lower()
    if env in ("0", "false"):
        return False
    if not _HAS_PLTPU:
        return False
    if env != "force" and jax.default_backend().lower() not in ("tpu", "axon"):
        return False
    if any(op.padding):
        return False
    if not getattr(op.mesh, "is_tensor_product", False):
        return False
    ns = tuple(op.mesh.node_shape)
    if len(ns) not in (2, 3):
        return False
    if any(n < 3 for n in ns):
        return False  # no interior
    try:
        geo = _geometry(op)
    except ValueError:
        return False
    return geo.Rp <= _MAX_RP


def _build_direct(op, refinements: int = 5):
    """Returns ``(solve_call, geo)``; ``solve_call(bh, bl) -> (xh, xl)``
    runs the whole mixed-precision direct solve as one pallas_call on
    packed df buffers."""
    from perphil_tpu.ops.direct import FastDiagDPPSolver

    geo = _geometry(op)
    Rp, Wp = geo.Rp, geo.Wp
    fd = FastDiagDPPSolver(op.mesh, op.params)
    eig = fd._eig  # coordinate-ordered (x first): (S, lam) per axis
    a11, a22, det = fd._mode_data  # interior-mode grids, slowest-first
    a12 = -float(op.params.beta / op.params.mu)
    dim = geo.dim
    # interior extents, slowest-first: 3D (z, y, x) / 2D (y, x)
    inner = tuple(n - 2 for n in op.mesh.node_shape)
    if dim == 2:
        iy, ix = inner
        iz = 1
        zplanes = [0]
    else:
        iz, iy, ix = inner
        zplanes = list(range(1, geo.planes - 1))
    Sx = np.asarray(eig[0][0], np.float32)  # (ix, ix)
    Sy = np.asarray(eig[1][0], np.float32)
    Sz = np.asarray(eig[2][0], np.float32) if dim == 3 else None
    a11g = np.asarray(a11, np.float32).reshape((iz, iy, ix))
    a22g = np.asarray(a22, np.float32).reshape((iz, iy, ix))
    detg = np.asarray(det, np.float32).reshape((iz, iy, ix))

    _matvec = build_packed_matvec(geo, op)

    def _gather_interior(v, f):
        """Packed (Rp, Wp) -> list of (iy, ix) interior blocks per z-plane."""
        blocks = []
        for p in zplanes:
            r0 = geo._base_row(f, p) + 1
            blocks.append(v[r0 : r0 + iy, 2 : 2 + ix])
        return blocks

    def _fwd(blocks, Sx_c, SyT_c):
        """Analysis transforms: Sy^T . B . Sx per plane, then z-combine."""
        hi = jax.lax.Precision.HIGHEST
        t = [
            jnp.dot(jnp.dot(SyT_c, b, precision=hi), Sx_c, precision=hi)
            for b in blocks
        ]
        if dim == 2:
            return t
        # fhat_q = sum_p Sz[p, q] * B_p (constant scalar weights)
        out = []
        for q in range(iz):
            acc = t[0] * np.float32(Sz[0, q])
            for p in range(1, iz):
                acc = acc + t[p] * np.float32(Sz[p, q])
            out.append(acc)
        return out

    def _inv(blocks, SxT_c, Sy_c):
        """Synthesis transforms: Sy . B . Sx^T per plane, then z-combine."""
        hi = jax.lax.Precision.HIGHEST
        if dim == 3:
            # u_p = sum_q Sz[p, q] * Bhat_q
            mixed = []
            for p in range(iz):
                acc = blocks[0] * np.float32(Sz[p, 0])
                for q in range(1, iz):
                    acc = acc + blocks[q] * np.float32(Sz[p, q])
                mixed.append(acc)
            blocks = mixed
        return [
            jnp.dot(jnp.dot(Sy_c, b, precision=hi), SxT_c, precision=hi)
            for b in blocks
        ]

    def _fastdiag(v, mats):
        """f32 exact interior solve; returns (Rp, Wp) with interior values
        and zeros elsewhere. ``mats`` carries the kernel-input constants
        (Pallas kernels may not capture array constants)."""
        Sx_c, SxT_c, Sy_c, SyT_c, A11g, A22g, Dg = mats
        f1 = _fwd(_gather_interior(v, 0), Sx_c, SyT_c)
        f2 = _fwd(_gather_interior(v, 1), Sx_c, SyT_c)
        u1, u2 = [], []
        for q in range(iz):
            A11 = A11g[q]
            A22 = A22g[q]
            D = Dg[q]
            u1.append((A22 * f1[q] - np.float32(a12) * f2[q]) / D)
            u2.append((A11 * f2[q] - np.float32(a12) * f1[q]) / D)
        z1 = _inv(u1, SxT_c, Sy_c)
        z2 = _inv(u2, SxT_c, Sy_c)
        out = jnp.zeros((Rp, Wp), jnp.float32)
        for f, zb in ((0, z1), (1, z2)):
            for i, p in enumerate(zplanes):
                out = _overlay_block(out, zb[i], geo._base_row(f, p) + 1, 2)
        return out

    def kernel(bh_ref, bl_ref, im_ref, bm_ref, fm_ref,
               sx_ref, sxt_ref, sy_ref, syt_ref, a11_ref, a22_ref, det_ref,
               oxh_ref, oxl_ref):
        imask = im_ref[:]
        bmask = bm_ref[:]
        fmask = fm_ref[:]
        mats = (sx_ref[:], sxt_ref[:], sy_ref[:], syt_ref[:],
                a11_ref[:], a22_ref[:], det_ref[:])
        b = (bh_ref[:], bl_ref[:])
        # x0: boundary = b (identity rows; BOTH df halves — dropping the lo
        # half leaves an O(eps32*|b|) boundary residual that interior-only
        # refinement can never remove), interior = fast-diag solve
        x = (b[0] * bmask + _fastdiag(b[0], mats), b[1] * bmask)
        for _ in range(refinements):
            r = df_sub(b, _matvec(x, imask, bmask, fmask))
            rs = r[0] + r[1]
            # boundary rows are identity: their exact correction IS the
            # residual (mirrors FastDiag*.solve's b.at[inner].set semantics)
            dx = _fastdiag(rs, mats) + rs * bmask
            x = df_add(x, (dx, jnp.zeros((Rp, Wp), jnp.float32)))
        oxh_ref[:] = x[0]
        oxl_ref[:] = x[1]

    imask_a = jnp.asarray(geo.imask)
    bmask_a = jnp.asarray(geo.bmask)
    fmask_a = jnp.asarray(geo.fmask)
    consts = (
        jnp.asarray(Sx), jnp.asarray(Sx.T.copy()),
        jnp.asarray(Sy), jnp.asarray(Sy.T.copy()),
        jnp.asarray(a11g), jnp.asarray(a22g), jnp.asarray(detg),
    )

    def solve_call(bh, bl):
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            ),
            in_specs=[vm] * 12,
            out_specs=(vm, vm),
            interpret=(jax.default_backend().lower() not in ("tpu", "axon")),
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if _HAS_PLTPU
                else None
            ),
        )(bh, bl, imask_a, bmask_a, fmask_a, *consts)

    return solve_call, geo


def fused_direct_solve(op, refinements: int = 5):
    """Returns ``solve(b1, b2) -> (z1, z2)`` (f64 in/out, per-field node
    grids): the whole mixed-precision direct solve as one Pallas kernel.
    Same role and accuracy class as ``ops/mixed.MixedPrecisionDPPDirect``
    (cites reference ``solver.py:66-71`` MUMPS duty)."""
    from perphil_tpu.ops.df32 import df_from_f64

    solve_call, geo = _build_direct(op, refinements)

    def solve(b1, b2):
        b1d = df_from_f64(b1)
        b2d = df_from_f64(b2)
        bh = geo.pack(jnp.stack([b1d[0], b2d[0]]))
        bl = geo.pack(jnp.stack([b1d[1], b2d[1]]))
        xh, xl = solve_call(bh, bl)
        xh2 = geo.unpack(xh)
        xl2 = geo.unpack(xl)
        z1 = xh2[0].astype(jnp.float64) + xl2[0].astype(jnp.float64)
        z2 = xh2[1].astype(jnp.float64) + xl2[1].astype(jnp.float64)
        return z1, z2

    return solve


# ---------------------------------------------------------------------------
# simplicial "MUMPS role": fused preconditioned CG (one kernel per solve)
# ---------------------------------------------------------------------------


def fused_simplicial_direct_supported(op) -> bool:
    """Fused PCG direct-surrogate coverage: small SIMPLICIAL meshes (the
    tensor-product case uses the exact fused fast-diag above). Mirrors the
    XLA path's documented MUMPS substitution: machine-tolerance PCG with a
    block-diagonal lumped fast-diag preconditioner
    (``solvers/solver._monolithic_direct``)."""
    env = os.environ.get("PERPHIL_TPU_FUSED_DIRECT", "1").lower()
    if env in ("0", "false"):
        return False
    if not _HAS_PLTPU:
        return False
    if env != "force" and jax.default_backend().lower() not in ("tpu", "axon"):
        return False
    if any(op.padding):
        return False
    if getattr(op.mesh, "is_tensor_product", False):
        return False
    ns = tuple(op.mesh.node_shape)
    if len(ns) not in (2, 3):
        return False
    if any(n < 3 for n in ns):
        return False
    try:
        geo = _geometry(op)
    except ValueError:
        return False
    return geo.Rp <= _MAX_RP


def _build_simplicial_pcg(op, rtol: float, max_it: int):
    """Whole-solve fused PCG kernel: double-float CG (mirroring
    ``ops/krylov.cg_df``) on the packed layout, preconditioned by per-field
    lumped-tensor fast-diag interior solves + identity boundary rows."""
    from perphil_tpu.ops.direct import FastDiagFieldSolver
    from perphil_tpu.ops.pallas_gmres import _df_div, _df_gt, _df_sqrt
    from perphil_tpu.ops.df32 import df_add as _dfadd

    geo = _geometry(op)
    Rp, Wp = geo.Rp, geo.Wp
    p = op.params
    fs = [
        FastDiagFieldSolver(op.mesh, float(p.k1), float(p.beta), float(p.mu), lumped=True),
        FastDiagFieldSolver(op.mesh, float(p.k2), float(p.beta), float(p.mu), lumped=True),
    ]
    eig = fs[0]._eig  # lumped 1D eigenpairs are field-independent
    dim = geo.dim
    inner = tuple(n - 2 for n in op.mesh.node_shape)
    if dim == 2:
        iy, ix = inner
        iz = 1
        zplanes = [0]
    else:
        iz, iy, ix = inner
        zplanes = list(range(1, geo.planes - 1))
    Sx = np.asarray(eig[0][0], np.float32)
    Sy = np.asarray(eig[1][0], np.float32)
    Sz = np.asarray(eig[2][0], np.float32) if dim == 3 else None
    sc1 = np.asarray(fs[0]._mode_scale, np.float32).reshape((iz, iy, ix))
    sc2 = np.asarray(fs[1]._mode_scale, np.float32).reshape((iz, iy, ix))

    _matvec = build_packed_matvec(geo, op)
    hi = jax.lax.Precision.HIGHEST

    def _field_blocks(v, f):
        return [
            v[geo._base_row(f, q) + 1 : geo._base_row(f, q) + 1 + iy, 2 : 2 + ix]
            for q in zplanes
        ]

    def _zcomb(blocks, transpose):
        if dim == 2:
            return blocks
        out = []
        for q in range(iz):
            w = (lambda pq: Sz[pq, q]) if transpose else (lambda pq: Sz[q, pq])
            acc = blocks[0] * np.float32(w(0))
            for pq in range(1, iz):
                acc = acc + blocks[pq] * np.float32(w(pq))
            out.append(acc)
        return out

    def _pc(v, mats):
        """Block-diagonal lumped fast-diag: interior solves per field,
        identity on boundary rows."""
        Sx_c, SxT_c, Sy_c, SyT_c, S1g, S2g, bmask = mats
        out = v * bmask  # identity boundary rows
        for f, Sg in ((0, S1g), (1, S2g)):
            t = [
                jnp.dot(jnp.dot(SyT_c, b, precision=hi), Sx_c, precision=hi)
                for b in _field_blocks(v, f)
            ]
            t = _zcomb(t, transpose=True)
            t = [t[q] / Sg[q] for q in range(iz)]
            t = _zcomb(t, transpose=False)
            t = [
                jnp.dot(jnp.dot(Sy_c, b, precision=hi), SxT_c, precision=hi)
                for b in t
            ]
            for i, q in enumerate(zplanes):
                out = _overlay_block(out, t[i], geo._base_row(f, q) + 1, 2)
        return out

    def kernel(bh_ref, bl_ref, im_ref, bm_ref, fm_ref,
               sx_ref, sxt_ref, sy_ref, syt_ref, s1_ref, s2_ref,
               oxh_ref, oxl_ref, oits_ref,
               rh_ref, rl_ref, zh_ref, zl_ref, ph_ref, pl_ref, sc_ref):
        imask = im_ref[:]
        bmask = bm_ref[:]
        fmask = fm_ref[:]
        mats = (sx_ref[:], sxt_ref[:], sy_ref[:], syt_ref[:],
                s1_ref[:], s2_ref[:], bmask)
        b = (bh_ref[:], bl_ref[:])
        zero = jnp.zeros((Rp, Wp), jnp.float32)

        def tdot(u, v):
            from perphil_tpu.ops.df32 import two_prod as _tp

            ph_, pe_ = _tp(u[0], v[0])
            pe_ = pe_ + u[0] * v[1] + u[1] * v[0]
            s = (ph_, pe_)
            R = Rp
            while R > 1:
                half = R // 2
                s = _dfadd(
                    (s[0][:half], s[1][:half]), (s[0][half:R], s[1][half:R])
                )
                R = half
            C = Wp
            while C > 1:
                half = C // 2
                s = _dfadd(
                    (s[0][:, :half], s[1][:, :half]),
                    (s[0][:, half:C], s[1][:, half:C]),
                )
                C = half
            return s[0][0, 0], s[1][0, 0]

        # x0 = 0; r = b; z = P r; p = z
        oxh_ref[:] = zero
        oxl_ref[:] = zero
        rh_ref[:] = b[0]
        rl_ref[:] = b[1]
        z0 = _pc(b[0] + b[1], mats)
        zh_ref[:] = z0
        zl_ref[:] = zero
        ph_ref[:] = z0
        pl_ref[:] = zero
        rnorm0 = _df_sqrt(tdot(b, b))
        rz0 = tdot((z0, zero), b)
        sc_ref[0] = jnp.float32(rtol) * rnorm0[0]  # tol (f32-grade is ample
        sc_ref[1] = 0.0  # for a 1e-13 RELATIVE target on a df residual)
        sc_ref[2] = rz0[0]
        sc_ref[3] = rz0[1]
        oits_ref[0] = 0

        # the while cond must be effect-free (ref reads in a cond see stale
        # state) — carry (its, done) and compute done inside the body, like
        # the fused GMRES kernel's outer loop
        def body(carry):
            its, _ = carry
            r = (rh_ref[:], rl_ref[:])
            p_ = (ph_ref[:], pl_ref[:])
            rz = (sc_ref[2], sc_ref[3])
            Ap = _matvec(p_, imask, bmask, fmask)
            alpha = _df_div(rz, tdot(p_, Ap))
            x = _dfadd((oxh_ref[:], oxl_ref[:]), _df_scale_pair(p_, alpha))
            oxh_ref[:] = x[0]
            oxl_ref[:] = x[1]
            nalpha = (-alpha[0], -alpha[1])
            r = _dfadd(r, _df_scale_pair(Ap, nalpha))
            rh_ref[:] = r[0]
            rl_ref[:] = r[1]
            znew = _pc(r[0] + r[1], mats)
            rz_new = tdot((znew, jnp.zeros_like(znew)), r)
            beta = _df_div(rz_new, rz)
            pnew = _dfadd((znew, jnp.zeros_like(znew)), _df_scale_pair(p_, beta))
            ph_ref[:] = pnew[0]
            pl_ref[:] = pnew[1]
            sc_ref[2] = rz_new[0]
            sc_ref[3] = rz_new[1]
            oits_ref[0] = its + 1
            rn = _df_sqrt(tdot(r, r))
            done = jnp.logical_not(_df_gt(rn, (sc_ref[0], sc_ref[1])))
            done |= jnp.logical_not(jnp.isfinite(rn[0] + rn[1]))
            return its + 1, jnp.where(done, jnp.int32(1), jnp.int32(0))

        def cond(carry):
            its, done = carry
            return (done == 0) & (its < max_it)

        rn0_gt = _df_gt(rnorm0, (sc_ref[0], sc_ref[1]))
        lax.while_loop(
            cond,
            body,
            (jnp.int32(0), jnp.where(rn0_gt, jnp.int32(0), jnp.int32(1))),
        )

    from perphil_tpu.ops.pallas_gmres import _df_scale as _df_scale_pair
    from jax import lax

    imask_a = jnp.asarray(geo.imask)
    bmask_a = jnp.asarray(geo.bmask)
    fmask_a = jnp.asarray(geo.fmask)
    consts = (
        jnp.asarray(Sx), jnp.asarray(Sx.T.copy()),
        jnp.asarray(Sy), jnp.asarray(Sy.T.copy()),
        jnp.asarray(sc1), jnp.asarray(sc2),
    )

    def solve_call(bh, bl):
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=[vm] * 11,
            out_specs=(vm, vm, sm),
            scratch_shapes=[pltpu.VMEM((Rp, Wp), jnp.float32)] * 6
            + [pltpu.SMEM((4,), jnp.float32)],
            interpret=(jax.default_backend().lower() not in ("tpu", "axon")),
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if _HAS_PLTPU
                else None
            ),
        )(bh, bl, imask_a, bmask_a, fmask_a, *consts)

    return solve_call, geo


def fused_simplicial_direct_solve(op, rtol: float = 1e-13, max_it: int = 2000):
    """Simplicial "MUMPS role" as one Pallas kernel: machine-tolerance
    double-float PCG with the block-diagonal lumped fast-diag
    preconditioner (same substitution the XLA path documents at
    ``solvers/solver._monolithic_direct``)."""
    from perphil_tpu.ops.df32 import df_from_f64

    solve_call, geo = _build_simplicial_pcg(op, rtol, max_it)

    def solve(b1, b2):
        b1d = df_from_f64(b1)
        b2d = df_from_f64(b2)
        bh = geo.pack(jnp.stack([b1d[0], b2d[0]]))
        bl = geo.pack(jnp.stack([b1d[1], b2d[1]]))
        xh, xl, _its = solve_call(bh, bl)
        xh2 = geo.unpack(xh)
        xl2 = geo.unpack(xl)
        z1 = xh2[0].astype(jnp.float64) + xl2[0].astype(jnp.float64)
        z2 = xh2[1].astype(jnp.float64) + xl2[1].astype(jnp.float64)
        return z1, z2

    return solve
