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
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from perphil_tpu.ops.df32 import df_add, df_sub
from perphil_tpu.ops.pallas_gmres import (
    _HAS_PLTPU,
    _geometry,
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
                r0 = geo._base_row(f, p) + 1
                out = jax.lax.dynamic_update_slice(out, zb[i], (r0, 2))
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
