"""Fully fused Pallas GMRES for small problems: one kernel per restart cycle.

Why: the df32 GMRES in ``ops/krylov.py`` runs each Arnoldi iteration as
~30-50 separate XLA kernels (stencil shifts, the log-depth double-float
reduction trees, the f64 scalar chain), so on TPU a small-N iteration costs
100-300 us of launch/sequencing overhead against microseconds of compute.
The reference's CPU PETSc runs the same iteration in ~7-80 us at these
sizes (``/root/reference/notebooks/results-conforming-2d/petsc_profiling/
petsc_perf_breakdown.csv``), which made unpreconditioned GMRES at 2D
N in [8, 64] and 3D nx in [4, 8] the only solver cells still losing to the
CPU baseline. This module fuses an entire GMRES(30) restart cycle —
residual, matvec, double-float classical Gram-Schmidt, Givens rotations,
triangular solve, solution update — into ONE Pallas kernel whose state
lives in VMEM/SMEM for the whole cycle; per-iteration cost drops to pure
VPU compute.

Numerics: identical double-float (two-f32) vector arithmetic as
``ops/krylov.gmres_df`` (same EFT primitives from ``ops/df32``), with the
Hessenberg/Givens scalar chain in double-float instead of emulated f64
(Mosaic has no f64). Effective scalar precision drops from 53 to ~49
mantissa bits and the projection reductions run a row/lane halving tree
instead of the flattened pairwise tree, so iteration counts can shift by
+-1-2 at convergence boundaries — within the documented df-mode drift
(README "parity" section; the CPU-x64 parity path is untouched).

Layout: both pressure fields are packed into one (Rp, 128) f32 buffer
(hi, lo pairs): field f occupies rows [f*Fr+1, f*Fr+1+H) and lanes
[1, 1+W), surrounded by zero halo rows/lanes; for 3D the field block is
the D-stack of z-planes, each plane carrying its own halo rows, so every
stencil offset is one static full-buffer row/lane shift (halo zeros absorb
cross-plane and cross-field bleed; boundary masking restores identity
rows). Rp is padded to a power of two so reductions are exact halving
trees (padding rows are zero and participate harmlessly).

The restart-cycle loop stays at the XLA level (``lax.while_loop`` around
the pallas_call), mirroring ``gmres_df``'s outer ``cycle`` loop including
its divergence / non-finite / no-progress exits.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from perphil_tpu.ops.df32 import df_add, df_sub, fast_two_sum, two_prod
from perphil_tpu.ops.krylov import DEFAULT_DTOL, KrylovResult
from perphil_tpu.ops.stencil import compile_stencils

try:  # pragma: no cover - import guard mirrors ops/pallas_kernels.py
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


_LANES = 128
_VMEM_BUDGET_BYTES = int(
    os.environ.get("PERPHIL_TPU_FUSED_GMRES_VMEM", str(12 * 1024 * 1024))
)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


# ---------------------------------------------------------------------------
# double-float helpers shared by kernel and trace level (pure jnp, f32)
# ---------------------------------------------------------------------------


def _df_mul(a, b):
    p, e = two_prod(a[0], b[0])
    e = e + a[0] * b[1] + a[1] * b[0]
    return fast_two_sum(p, e)


def _df_div(a, b):
    """Double-float division a / b (one Newton correction step)."""
    q0 = a[0] / b[0]
    r = df_sub(a, _df_mul((q0, jnp.zeros_like(q0)), b))
    q1 = (r[0] + r[1]) / b[0]
    return fast_two_sum(q0, q1)


def _df_sqrt(a):
    """Double-float square root (one correction step)."""
    s0 = jnp.sqrt(jnp.maximum(a[0], 0.0))
    safe = jnp.where(s0 > 0.0, s0, 1.0)
    r = df_sub(a, (s0 * s0, jnp.zeros_like(s0)))
    # s0*s0 loses the low product bits; recover them exactly
    p, e = two_prod(s0, s0)
    r = df_sub(a, (p, e))
    corr = (r[0] + r[1]) / (2.0 * safe)
    return fast_two_sum(s0, jnp.where(s0 > 0.0, corr, 0.0))


def _df_gt(a, b):
    """a > b for canonical double-float pairs."""
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] > b[1]))


def _df_mask(x, m):
    """Multiply a df pair by an exact {0,1} f32 mask."""
    return x[0] * m, x[1] * m


def _df_scale(x, c):
    """df vector x times df scalar c."""
    p, e = two_prod(x[0], c[0])
    e = e + x[0] * c[1] + x[1] * c[0]
    return fast_two_sum(p, e)


def _split_const(w: float):
    """f64 constant -> (hi, lo) np.float32 scalars. np scalars stay inline
    HLO literals (python floats would make ``two_prod``'s Dekker split run
    in f64 and then round — silently f32-grade error terms)."""
    hi = np.float32(w)
    lo = np.float32(w - float(hi))
    return hi, lo


def _two_prod_wconst(x, w):
    """Error-free ``x * w`` for an f32 array x and np.float32 constant w.
    The constant's Dekker split is done at trace time in forced-f32 numpy
    arithmetic (promotion-rule proof)."""
    from perphil_tpu.ops.df32 import split

    p = x * w
    a_hi, a_lo = split(x)
    t = np.float32(np.float32(4097.0) * w)
    b_hi = np.float32(t - np.float32(t - w))
    b_lo = np.float32(w - b_hi)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def _shift(a, dr: int, dc: int):
    """Zero-fill shift: out[r, c] = a[r + dr, c + dc] (static offsets)."""
    if dr == 0 and dc == 0:
        return a
    R, C = a.shape
    pu, pd = max(-dr, 0), max(dr, 0)
    pleft, pright = max(-dc, 0), max(dc, 0)
    padded = jnp.pad(a, ((pu, pd), (pleft, pright)))
    return padded[pd : pd + R, pright : pright + C]


def _shift_df(a, dr: int, dc: int):
    return _shift(a[0], dr, dc), _shift(a[1], dr, dc)


# ---------------------------------------------------------------------------
# packed-layout geometry
# ---------------------------------------------------------------------------


class _Geometry:
    """Static packing data for one mesh."""

    def __init__(self, node_shape: Tuple[int, ...], bdry: np.ndarray):
        self.node_shape = tuple(int(n) for n in node_shape)
        dim = len(self.node_shape)
        if dim == 2:
            planes, rows, cols = 1, self.node_shape[0], self.node_shape[1]
        elif dim == 3:
            planes, rows, cols = self.node_shape
        else:  # pragma: no cover
            raise ValueError(f"fused GMRES supports 2D/3D, got dim={dim}")
        self.dim = dim
        self.planes, self.rows, self.cols = planes, rows, cols
        self.hrow = rows + 2  # per-plane rows incl. top/bottom halo
        self.Fr = planes * self.hrow  # rows per field block
        self.Rp = _next_pow2(2 * self.Fr)
        self.Wp = _LANES
        if cols + 2 > self.Wp:
            raise ValueError("field too wide for the fused kernel")

        def base_row(f: int, p: int) -> int:
            return f * self.Fr + p * self.hrow + 1

        self._base_row = base_row

        bmask = np.zeros((self.Rp, self.Wp), np.float32)
        imask = np.zeros((self.Rp, self.Wp), np.float32)
        interior = ~bdry
        for f in range(2):
            for p in range(planes):
                r0 = base_row(f, p)
                sl = (p,) if dim == 3 else ()
                bmask[r0 : r0 + rows, 1 : 1 + cols] = bdry[sl].astype(np.float32)
                imask[r0 : r0 + rows, 1 : 1 + cols] = interior[sl].astype(
                    np.float32
                )
        # field-0 row selector (for per-field permeability weights)
        fmask = np.zeros((self.Rp, self.Wp), np.float32)
        fmask[: self.Fr, :] = 1.0
        self.bmask, self.imask, self.fmask = bmask, imask, fmask

    def offsets(self):
        """3^d stencil index -> packed (drow, dlane) shift."""
        if self.dim == 2:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yield (dy + 1, dx + 1), (dy, dx)
        else:
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yield (
                            (dz + 1, dy + 1, dx + 1),
                            (dz * self.hrow + dy, dx),
                        )

    def pack(self, z):
        """(2, *node_shape) f32 -> (Rp, Wp) packed."""
        buf = jnp.zeros((self.Rp, self.Wp), jnp.float32)
        for f in range(2):
            for p in range(self.planes):
                r0 = self._base_row(f, p)
                plane = z[f, p] if self.dim == 3 else z[f]
                buf = lax.dynamic_update_slice(
                    buf, plane.astype(jnp.float32), (r0, 1)
                )
        return buf

    def unpack(self, buf):
        """(Rp, Wp) packed -> (2, *node_shape) f32."""
        fields = []
        for f in range(2):
            planes = [
                lax.dynamic_slice(
                    buf, (self._base_row(f, p), 1), (self.rows, self.cols)
                )
                for p in range(self.planes)
            ]
            fields.append(jnp.stack(planes) if self.dim == 3 else planes[0])
        return jnp.stack(fields)


@lru_cache(maxsize=32)
def _geometry_cached(node_shape: Tuple[int, ...], bdry_bytes: bytes) -> _Geometry:
    bdry = np.frombuffer(bdry_bytes, dtype=np.bool_).reshape(node_shape)
    return _Geometry(node_shape, bdry)


def _geometry(op) -> _Geometry:
    bdry = np.ascontiguousarray(np.asarray(op.mesh.boundary_mask(), np.bool_))
    return _geometry_cached(tuple(op.mesh.node_shape), bdry.tobytes())


def fused_gmres_supported(op) -> bool:
    """Whether the operator fits the fused small-problem cycle kernel.

    Default-on only on TPU-class backends: on CPU the kernel runs in Pallas
    interpret mode (orders of magnitude slower than the XLA path, and
    subject to the CPU EFT-contraction hazard — see ``ops/df32``).
    ``PERPHIL_TPU_FUSED_GMRES=force`` opts in anyway (validation tests,
    which must also compile with ``eft_safe_compiler_options()``).
    """
    env = os.environ.get("PERPHIL_TPU_FUSED_GMRES", "1").lower()
    if env in ("0", "false"):
        return False
    if not _HAS_PLTPU:
        return False
    if env != "force" and jax.default_backend().lower() not in ("tpu", "axon"):
        return False
    if any(op.padding):
        return False  # phantom-padded (sharded) grids use the XLA path
    ns = tuple(op.mesh.node_shape)
    if len(ns) == 2:
        planes, rows, cols = 1, ns[0], ns[1]
    elif len(ns) == 3:
        planes, rows, cols = ns
    else:
        return False
    if cols + 2 > _LANES:
        return False
    Rp = _next_pow2(2 * planes * (rows + 2))
    vbytes = 2 * 31 * Rp * _LANES * 4  # hi+lo basis dominates VMEM
    return vbytes <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# the fused restart-cycle kernel
# ---------------------------------------------------------------------------


def _build_cycle(op, m: int, debug: bool = False):
    """Returns ``(cycle_call, geo)`` where ``cycle_call`` runs one GMRES(m)
    cycle as a single pallas_call. ``debug`` adds V/R/g/y dumps to the
    outputs (numerics-validation harness only)."""
    geo = _geometry(op)
    K_st, M_st = compile_stencils(op.mesh)
    K_st = np.asarray(K_st, np.float64)
    M_st = np.asarray(M_st, np.float64)
    p = op.params
    k1w, k2w, bw = float(p.k1 / p.mu), float(p.k2 / p.mu), float(p.beta / p.mu)
    Rp, Wp, Fr = geo.Rp, geo.Wp, geo.Fr
    m1 = m + 1
    nS = m1 + 1  # SMEM vector extent (index j+1 <= m fits with slack)
    cgs2 = os.environ.get("PERPHIL_TPU_FUSED_CGS2", "1").lower() not in (
        "0",
        "false",
    )

    def _axpy_const(acc, w: float, v):
        """acc += w * v for a trace-time f64 constant w (df pair arrays)."""
        w_hi, w_lo = _split_const(w)
        ph, pe = _two_prod_wconst(v[0], w_hi)
        pe = pe + v[1] * w_hi
        term = fast_two_sum(ph, pe)
        if float(w_lo) != 0.0:
            p2, e2 = _two_prod_wconst(v[0], w_lo)
            e2 = e2 + v[1] * w_lo
            term = df_add(term, fast_two_sum(p2, e2))
        return df_add(acc, term)

    def _matvec(z, imask, bmask, fmask):
        """Packed df matvec with symmetric BC elimination
        (mirrors DPPOperator.matvec, ``ops/assembly.py:192-212``)."""
        zi = _df_mask(z, imask)
        zero = (jnp.zeros((Rp, Wp), jnp.float32), jnp.zeros((Rp, Wp), jnp.float32))
        Kz = zero
        Mz = zero
        for sidx, (dr, dc) in geo.offsets():
            kw = float(K_st[sidx])
            mw = float(M_st[sidx])
            if kw == 0.0 and mw == 0.0:
                continue
            sh = _shift_df(zi, dr, dc)
            if kw != 0.0:
                Kz = _axpy_const(Kz, kw, sh)
            if mw != 0.0:
                Mz = _axpy_const(Mz, mw, sh)
        # swap field blocks of Mz (coupling term reads the *other* field)
        swap = (
            _shift(Mz[0], -Fr, 0) + _shift(Mz[0], Fr, 0),
            _shift(Mz[1], -Fr, 0) + _shift(Mz[1], Fr, 0),
        )
        Kz1 = _df_mask(Kz, fmask)
        Kz2 = _df_mask(Kz, 1.0 - fmask)
        y = zero
        y = _axpy_const(y, k1w, Kz1)
        y = _axpy_const(y, k2w, Kz2)
        y = _axpy_const(y, bw, Mz)
        y = _axpy_const(y, -bw, swap)
        return df_add(_df_mask(y, imask), _df_mask(z, bmask))

    def _tree_reduce(terms):
        """Pairwise df-add reduction of a Python list of df pairs (mirrors
        dfvec.df_sum_tree's halving tree over the basis axis; sequential
        accumulation costs ~m/log2(m) times the rounding error)."""
        while len(terms) > 1:
            nxt = []
            for i in range(0, len(terms) - 1, 2):
                nxt.append(df_add(terms[i], terms[i + 1]))
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def _tree_dot(u, v):
        """df dot of packed df pairs -> df scalar (pair of () f32 values).
        Row/lane halving trees are exact because padding is zero."""
        ph, pe = two_prod(u[0], v[0])
        pe = pe + u[0] * v[1] + u[1] * v[0]
        s = (ph, pe)
        R = Rp
        while R > 1:
            half = R // 2
            s = df_add((s[0][:half], s[1][:half]), (s[0][half:R], s[1][half:R]))
            R = half
        C = Wp
        while C > 1:
            half = C // 2
            s = df_add(
                (s[0][:, :half], s[1][:, :half]),
                (s[0][:, half:C], s[1][:, half:C]),
            )
            C = half
        return s[0][0, 0], s[1][0, 0]

    def kernel(*refs):
        (xh_ref, xl_ref, bh_ref, bl_ref, im_ref, bm_ref, fm_ref,
         its_ref, tol_ref, div_ref, maxit_ref) = refs[:11]
        n_out = 5 + (12 if debug else 0)
        outs = refs[11 : 11 + n_out]
        oxh_ref, oxl_ref, oj_ref, oits_ref, orn_ref = outs[:5]
        debug_refs = outs[5:] if debug else None
        (Vh_ref, Vl_ref,
         hh_ref, hl_ref, csh_ref, csl_ref, snh_ref, snl_ref, gh_ref, gl_ref,
         yh_ref, yl_ref, ch_ref, cl_ref, rn_ref, st_ref,
         Rh_ref, Rl_ref) = refs[11 + n_out :]
        imask = im_ref[:]
        bmask = bm_ref[:]
        fmask = fm_ref[:]
        x = (xh_ref[:], xl_ref[:])
        b = (bh_ref[:], bl_ref[:])
        tol = (tol_ref[0], tol_ref[1])
        div = (div_ref[0], div_ref[1])
        max_it = maxit_ref[0]

        # r = b - A x ; beta = ||r||
        r = df_sub(b, _matvec(x, imask, bmask, fmask))
        beta = _df_sqrt(_tree_dot(r, r))
        nz = beta[0] > 0.0
        inv = _df_div((1.0, 0.0), beta)
        inv = (jnp.where(nz, inv[0], 1.0), jnp.where(nz, inv[1], 0.0))
        v0 = _df_scale(r, inv)

        Vh_ref[:] = jnp.zeros((m1, Rp, Wp), jnp.float32)
        Vl_ref[:] = jnp.zeros((m1, Rp, Wp), jnp.float32)
        Vh_ref[0] = v0[0]
        Vl_ref[0] = v0[1]
        for ref in (hh_ref, hl_ref, csh_ref, csl_ref, snh_ref, snl_ref,
                    gh_ref, gl_ref, yh_ref, yl_ref, ch_ref, cl_ref):
            ref[...] = jnp.zeros((nS,), jnp.float32)
        Rh_ref[:] = jnp.zeros((m1, m1), jnp.float32)
        Rl_ref[:] = jnp.zeros((m1, m1), jnp.float32)
        gh_ref[0] = beta[0]
        gl_ref[0] = beta[1]
        rn_ref[0] = beta[0]
        rn_ref[1] = beta[1]
        st_ref[0] = its_ref[0]  # running iteration count
        st_ref[1] = 0  # j = completed Arnoldi steps this cycle

        def body(j, _):
            rnorm = (rn_ref[0], rn_ref[1])
            its = st_ref[0]
            ok = (st_ref[1] == j) & (its < max_it)
            ok &= _df_gt(rnorm, tol)
            ok &= jnp.logical_not(_df_gt(rnorm, div))

            @pl.when(ok)
            def _():
                vj = (Vh_ref[j], Vl_ref[j])
                w = _matvec(vj, imask, bmask, fmask)
                # classical Gram-Schmidt; projections accumulate through a
                # pairwise df tree (like dfvec.df_basis_comb) so rounding
                # stays ~log2(m)*eps_df
                for j2 in range(m1):
                    hj = _tree_dot((Vh_ref[j2], Vl_ref[j2]), w)
                    hh_ref[j2] = hj[0]
                    hl_ref[j2] = hj[1]
                acc = _tree_reduce(
                    [
                        _df_scale((Vh_ref[j2], Vl_ref[j2]), (hh_ref[j2], hl_ref[j2]))
                        for j2 in range(m1)
                    ]
                )
                w = df_sub(w, acc)
                if cgs2:
                    # second Gram-Schmidt pass: restores the orthogonality
                    # the single-pass df CGS loses near stagnation (which
                    # otherwise inflates late-cycle iteration counts)
                    for j2 in range(m1):
                        cj = _tree_dot((Vh_ref[j2], Vl_ref[j2]), w)
                        ch_ref[j2] = cj[0]
                        cl_ref[j2] = cj[1]
                    acc2 = _tree_reduce(
                        [
                            _df_scale(
                                (Vh_ref[j2], Vl_ref[j2]), (ch_ref[j2], cl_ref[j2])
                            )
                            for j2 in range(m1)
                        ]
                    )
                    w = df_sub(w, acc2)
                    for j2 in range(m1):
                        hj = df_add(
                            (hh_ref[j2], hl_ref[j2]), (ch_ref[j2], cl_ref[j2])
                        )
                        hh_ref[j2] = hj[0]
                        hl_ref[j2] = hj[1]
                hj1 = _df_sqrt(_tree_dot(w, w))
                pos = hj1[0] > 0.0
                invn = _df_div((1.0, 0.0), hj1)
                invn = (
                    jnp.where(pos, invn[0], 1.0),
                    jnp.where(pos, invn[1], 0.0),
                )
                wn = _df_scale(w, invn)
                Vh_ref[j + 1] = wn[0]
                Vl_ref[j + 1] = wn[1]
                hh_ref[j + 1] = hj1[0]
                hl_ref[j + 1] = hj1[1]

                # stored Givens rotations 0..j-1 (sequential scalar chain)
                def rot(i, carry):
                    @pl.when(i < j)
                    def _():
                        c = (csh_ref[i], csl_ref[i])
                        s = (snh_ref[i], snl_ref[i])
                        hi_ = (hh_ref[i], hl_ref[i])
                        hi1 = (hh_ref[i + 1], hl_ref[i + 1])
                        t0 = df_add(_df_mul(c, hi_), _df_mul(s, hi1))
                        t1 = df_sub(_df_mul(c, hi1), _df_mul(s, hi_))
                        hh_ref[i] = t0[0]
                        hl_ref[i] = t0[1]
                        hh_ref[i + 1] = t1[0]
                        hl_ref[i + 1] = t1[1]

                    return carry

                lax.fori_loop(0, m, rot, 0)

                # new rotation zeroing h[j+1]
                a_ = (hh_ref[j], hl_ref[j])
                b_ = (hh_ref[j + 1], hl_ref[j + 1])
                den = _df_sqrt(df_add(_df_mul(a_, a_), _df_mul(b_, b_)))
                dpos = den[0] > 0.0
                den_s = (jnp.where(dpos, den[0], 1.0), den[1])
                cn = _df_div(a_, den_s)
                sn_ = _df_div(b_, den_s)
                cn = (jnp.where(dpos, cn[0], 1.0), jnp.where(dpos, cn[1], 0.0))
                sn_ = (
                    jnp.where(dpos, sn_[0], 0.0),
                    jnp.where(dpos, sn_[1], 0.0),
                )
                csh_ref[j] = cn[0]
                csl_ref[j] = cn[1]
                snh_ref[j] = sn_[0]
                snl_ref[j] = sn_[1]
                hjj = df_add(_df_mul(cn, a_), _df_mul(sn_, b_))
                hh_ref[j] = hjj[0]
                hl_ref[j] = hjj[1]
                hh_ref[j + 1] = 0.0
                hl_ref[j + 1] = 0.0

                def copycol(i, carry):
                    Rh_ref[i, j] = hh_ref[i]
                    Rl_ref[i, j] = hl_ref[i]
                    return carry

                lax.fori_loop(0, m, copycol, 0)

                gj = (gh_ref[j], gl_ref[j])
                t0 = _df_mul(cn, gj)
                t1 = _df_mul(sn_, gj)
                gh_ref[j] = t0[0]
                gl_ref[j] = t0[1]
                gh_ref[j + 1] = -t1[0]
                gl_ref[j + 1] = -t1[1]
                neg = gh_ref[j + 1] < 0.0
                rn_ref[0] = jnp.abs(gh_ref[j + 1])
                rn_ref[1] = jnp.where(neg, -gl_ref[j + 1], gl_ref[j + 1])
                st_ref[0] = its + 1
                st_ref[1] = j + 1

            return _

        lax.fori_loop(0, m, lambda j, c: (body(j, c), 0)[1], 0)
        j = st_ref[1]

        # back substitution y = R[:j,:j]^{-1} g[:j] (y beyond j stays 0)
        def back(i2, carry):
            i = m - 1 - i2

            @pl.when(i < j)
            def _():
                def inner(k, acc):
                    take = k > i
                    term = _df_mul(
                        (Rh_ref[i, k], Rl_ref[i, k]), (yh_ref[k], yl_ref[k])
                    )
                    return df_add(
                        acc,
                        (
                            jnp.where(take, term[0], 0.0),
                            jnp.where(take, term[1], 0.0),
                        ),
                    )

                acc = lax.fori_loop(
                    0, m, inner, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
                )
                s = df_sub((gh_ref[i], gl_ref[i]), acc)
                rii = (Rh_ref[i, i], Rl_ref[i, i])
                safe = jnp.abs(rii[0]) > 0.0
                yi = _df_div(s, (jnp.where(safe, rii[0], 1.0), rii[1]))
                yh_ref[i] = jnp.where(safe, yi[0], 0.0)
                yl_ref[i] = jnp.where(safe, yi[1], 0.0)

            return carry

        lax.fori_loop(0, m, back, 0)

        # x += sum_i y_i V_i (pairwise df tree, as in the projections)
        upd = _tree_reduce(
            [
                _df_scale((Vh_ref[j2], Vl_ref[j2]), (yh_ref[j2], yl_ref[j2]))
                for j2 in range(m)
            ]
        )
        if debug_refs is not None:
            duh, dul, dy2h, dy2l = debug_refs[8:]
            duh[:] = upd[0]
            dul[:] = upd[1]
            for i in range(nS):
                dy2h[i] = yh_ref[i]
                dy2l[i] = yl_ref[i]
        xnew = df_add(x, upd)
        oxh_ref[:] = xnew[0]
        oxl_ref[:] = xnew[1]
        oj_ref[0] = j
        oits_ref[0] = st_ref[0]
        orn_ref[0] = rn_ref[0]
        orn_ref[1] = rn_ref[1]
        if debug_refs is not None:
            dVh, dVl, dRh, dRl, dgh, dgl, dyh, dyl = debug_refs[:8]
            dVh[:] = Vh_ref[:]
            dVl[:] = Vl_ref[:]
            dRh[:] = Rh_ref[:]
            dRl[:] = Rl_ref[:]
            for i in range(nS):
                dgh[i] = gh_ref[i]
                dgl[i] = gl_ref[i]
                dyh[i] = yh_ref[i]
                dyl[i] = yl_ref[i]

    imask_a = jnp.asarray(geo.imask)
    bmask_a = jnp.asarray(geo.bmask)
    fmask_a = jnp.asarray(geo.fmask)

    def cycle_call(xh, xl, bh, bl, its, tol2, div2, max_it):
        out_shape = (
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        )
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_specs = (vm, vm, sm, sm, sm)
        if debug:
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((m1, Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((m1, Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((m1, m1), jnp.float32),
                jax.ShapeDtypeStruct((m1, m1), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
                jax.ShapeDtypeStruct((nS,), jnp.float32),
            )
            out_specs = out_specs + (
                vm, vm, sm, sm, sm, sm, sm, sm, vm, vm, sm, sm
            )
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[vm, vm, vm, vm, vm, vm, vm, sm, sm, sm, sm],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((m1, Rp, Wp), jnp.float32),
                pltpu.VMEM((m1, Rp, Wp), jnp.float32),
            ]
            + [pltpu.SMEM((nS,), jnp.float32)] * 12
            + [
                pltpu.SMEM((2,), jnp.float32),  # rn_ref
                pltpu.SMEM((2,), jnp.int32),  # st_ref (its, j)
                pltpu.SMEM((m1, m1), jnp.float32),
                pltpu.SMEM((m1, m1), jnp.float32),
            ],
            interpret=(jax.default_backend().lower() not in ("tpu", "axon")),
        )(
            xh, xl, bh, bl, imask_a, bmask_a, fmask_a,
            jnp.reshape(its, (1,)).astype(jnp.int32),
            tol2, div2,
            jnp.asarray([max_it], jnp.int32),
        )

    return cycle_call, geo


def fused_gmres_df(
    op,
    b_df,
    x0_df,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 10000,
    restart: int = 30,
    dtol: float = DEFAULT_DTOL,
) -> KrylovResult:
    """Drop-in replacement for unpreconditioned
    ``gmres_df(op.stacked_matvec_df(), ...)`` running each restart cycle as
    one fused Pallas kernel. Same stopping semantics as
    ``ops/krylov.gmres_df`` (reference KSP defaults:
    ``/root/reference/src/perphil/solvers/parameters.py:12-21``)."""
    from perphil_tpu.ops.dfvec import df_norm, df_vec_sub

    cycle_call, geo = _build_cycle(op, int(restart))
    mv = op.stacked_matvec_df()

    r0 = df_vec_sub(b_df, mv(x0_df))
    rnorm0 = df_norm(r0)  # f64 scalar at XLA level, matching gmres_df
    tol = jnp.maximum(rtol * rnorm0, atol)
    div = dtol * rnorm0

    def _split_f64(s):
        hi = s.astype(jnp.float32)
        lo = (s - hi.astype(s.dtype)).astype(jnp.float32)
        return jnp.stack([hi, lo])

    tol2 = _split_f64(tol)
    div2 = _split_f64(div)

    xh = geo.pack(x0_df[0])
    xl = geo.pack(x0_df[1])
    bh = geo.pack(b_df[0])
    bl = geo.pack(b_df[1])

    def cycle(state):
        xh, xl, its, rnorm, done = state
        xh2, xl2, j, its2, rn = cycle_call(
            xh, xl, bh, bl, its, tol2, div2, max_it
        )
        j = j[0]
        its2 = its2[0]
        rnorm2 = rn[0].astype(rnorm.dtype) + rn[1].astype(rnorm.dtype)
        done = (
            (rnorm2 <= tol)
            | (its2 >= max_it)
            | (rnorm2 > div)
            | jnp.logical_not(jnp.isfinite(rnorm2))
            | (j == 0)
        )
        return xh2, xl2, its2, rnorm2, done

    init_done = rnorm0 <= tol
    its0 = jnp.asarray(0, jnp.int32)
    xh, xl, its, rnorm, _ = lax.while_loop(
        lambda s: jnp.logical_not(s[-1]),
        cycle,
        (xh, xl, its0, rnorm0, init_done),
    )
    x = (geo.unpack(xh), geo.unpack(xl))
    return KrylovResult(x, its, rnorm, rnorm <= tol)
