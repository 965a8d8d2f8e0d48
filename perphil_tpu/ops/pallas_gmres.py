"""Fully fused Pallas GMRES for small problems: one kernel per SOLVE.

Why: the df32 GMRES in ``ops/krylov.py`` runs each Arnoldi iteration as
~30-50 separate XLA kernels. On this backend the measured cost model
(re-measured 2026-08-19; see CLAUDE.md) is dispatch-dominated: a warm
dispatch costs a flat ~24 ms regardless of program size, in-program
``lax.scan``/``while_loop`` trips are cheap but not free (~8 us marginal
with a small matvec body, and a multi-kernel Krylov iteration pays that
per XLA op), while IN-KERNEL (Mosaic) loop iterations are nearly free
(<0.1 us marginal; an empty 30-iteration kernel body times the same as
the full GMRES body). The reference's CPU PETSc runs an iteration in
~7-80 us at small N (``/root/reference/notebooks/results-conforming-2d/
petsc_profiling/petsc_perf_breakdown.csv``), which made unpreconditioned
GMRES at 2D N in [8, 64] and 3D nx in [4, 8] the only solver cells still
losing to the CPU baseline. The consequence is architectural: ALL
sequential structure must live inside one kernel, and whole solves must
be chained inside one dispatch to amortize the flat ~24 ms. This module runs the
ENTIRE GMRES(30) solve — outer restart loop (``lax.while_loop``), residual,
matvec, double-float batched classical Gram-Schmidt, Givens rotations,
triangular solve, solution update, convergence/divergence tests — as ONE
Pallas kernel whose state lives in VMEM/SMEM for the whole solve.

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

The outer restart loop runs in-kernel, mirroring ``gmres_df``'s outer
``cycle`` loop including its divergence / non-finite / no-progress exits;
rnorm0/tol/div are computed in-kernel in double-float.
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

from perphil_tpu.ops.df32 import (
    df_add,
    df_sub,
    dyadic_factor,
    fast_two_sum,
    two_prod,
    two_sum,
)
from perphil_tpu.ops.krylov import DEFAULT_DTOL, KrylovResult
from perphil_tpu.ops.stencil import compile_stencils

try:  # pragma: no cover - import guard mirrors ops/pallas_kernels.py
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


_LANES = 128
# Gate on the dominant VMEM tenant (the hi+lo Krylov basis). Total scoped
# VMEM ~= 3x basis (in/out buffers + matvec/CGS temporaries); the kernel
# raises Mosaic's scoped-vmem limit to _VMEM_LIMIT accordingly (v5e has
# 128 MiB VMEM; the default scoped limit is 16 MiB, which a 2D N=64 basis
# alone exceeds).
_VMEM_BUDGET_BYTES = int(
    os.environ.get("PERPHIL_TPU_FUSED_GMRES_VMEM", str(20 * 1024 * 1024))
)
_VMEM_LIMIT = int(
    os.environ.get("PERPHIL_TPU_FUSED_GMRES_VMEM_LIMIT", str(100 * 1024 * 1024))
)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _fori(n: int, body, init):
    """``lax.fori_loop`` with int32 bounds: python-int bounds become int64
    under ``jax_enable_x64``, and Mosaic rejects 64-bit types in-kernel."""
    return lax.fori_loop(jnp.int32(0), jnp.int32(n), body, init)


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


def _shift_sum_df(a, shifts):
    """Sum of zero-fill shifts of a df pair. The grouped-geometry stencil
    decomposition (see _Geometry.offsets) guarantees the images are
    disjoint on real data positions, so a componentwise add is exact —
    at most one term is nonzero per element. An empty shift list (possible
    only for degenerate single-plane 3D geometries, which _Geometry
    cannot currently produce since node dims are >= 2) sums to zero."""
    if not shifts:
        return jnp.zeros_like(a[0]), jnp.zeros_like(a[1])
    out = _shift_df(a, *shifts[0])
    for dr, dc in shifts[1:]:
        nxt = _shift_df(a, dr, dc)
        out = (out[0] + nxt[0], out[1] + nxt[1])
    return out


def _overlay_block(out, blk, r0: int, c0: int):
    """Write ``blk`` into ``out`` at STATIC offsets ``(r0, c0)``.

    jax 0.9 dropped the Mosaic lowering for value-level
    ``dynamic_update_slice`` (and ``.at[].set`` scatter) inside TPU kernels;
    pad-and-add is the supported spelling. Every call site places interior
    blocks onto positions that are zero in ``out`` (freshly zeroed buffers
    or boundary-masked fields), so the add IS an overwrite.
    """
    h, w = blk.shape
    R, C = out.shape
    return out + jnp.pad(blk, ((r0, R - r0 - h), (c0, C - c0 - w)))


def _acc_tap(acc, entry, v):
    """acc += (m + r/c) * v for one stencil tap in c-units (df pairs).

    ``entry = (terms, m, r_over_c)`` from ``_stencil_applier``: ``terms``
    are the signed pow2 components of the dyadic ratio ``m`` (each product
    is EXACT in f32, so no two_prod is needed — one two_sum per term into
    the hi accumulator), the lo product uses the full ``m`` in one f32
    multiply (its rounding is lo-grade * 1e-7 ~ 1e-21 relative), and the
    assembly-rounding residual ``r/c`` (ulps of the tap) is a plain f32
    product folded into the lo accumulator. One renormalization per tap.
    The dyadic-pattern analog of ``_axpy_const`` (same trick as
    ``df32.df_apply_stencil``'s fast path; Mosaic-safe: adds/mults only,
    no bitcasts)."""
    terms, m, roc = entry
    s, e = acc
    if len(terms) == 1 and roc == 0.0:
        # pure-pow2 tap: keep the exact accumulation order of the original
        # pow2 fast path (bit-identical trajectories for every pow2-exact
        # stencil, incl. all published 2D cells and the pow2-size hexes)
        p = jnp.float32(m) * v[0]
        s, err = two_sum(s, p)
        e = e + (err + jnp.float32(m) * v[1])
        return fast_two_sum(s, e)
    for t in terms:
        p = jnp.float32(t) * v[0]
        s, err = two_sum(s, p)
        e = e + err
    if m != 0.0:
        e = e + jnp.float32(m) * v[1]
    if roc != 0.0:
        e = e + jnp.float32(roc) * v[0]
    return fast_two_sum(s, e)


# ---------------------------------------------------------------------------
# triple-float helpers (the knife-edge tf mode — see ops/tf32 for the value
# model; these are the packed-plane ports used by _build_cycle_ef64)
# ---------------------------------------------------------------------------


def _renorm3(a0, a1, a2):
    """Compress three roughly-ordered f32 components into a canonical
    triple (|mid| <= ulp(hi), |lo| <= ulp(mid)) — ``tf32._renorm3``."""
    s1, e2 = two_sum(a1, a2)
    s0, e1 = two_sum(a0, s1)
    t1, t2 = fast_two_sum(e1, e2)
    return s0, t1, t2


def _tf_add3(x, y):
    """Triple-float add, ~2^-72 relative (``tf32.tf_add``)."""
    r0, e0 = two_sum(x[0], y[0])
    t1, d1 = two_sum(x[1], y[1])
    r1, d2 = two_sum(e0, t1)
    r2 = d1 + d2 + x[2] + y[2]
    return _renorm3(r0, r1, r2)


def _tf_sub3(x, y):
    return _tf_add3(x, (-y[0], -y[1], -y[2]))


def _tf_mask3(x, m):
    return x[0] * m, x[1] * m, x[2] * m


def _tf_prod3(u, v):
    """Elementwise u*v of triples -> unnormalized-then-renormed triple
    (``tf32._tf_prod_terms``)."""
    p0, e0 = two_prod(u[0], v[0])
    p1, e1 = two_prod(u[0], v[1])
    p2, e2 = two_prod(u[1], v[0])
    tail = u[1] * v[1] + u[0] * v[2] + u[2] * v[0] + e1 + e2
    s1, d1 = two_sum(p1, p2)
    s1, d2 = two_sum(s1, e0)
    return _renorm3(p0, s1, d1 + d2 + tail)


def _shift_tf(a, dr: int, dc: int):
    return _shift(a[0], dr, dc), _shift(a[1], dr, dc), _shift(a[2], dr, dc)


def _shift_sum_tf(a, shifts):
    """Sum of zero-fill shifts of a triple (images disjoint on real
    positions — see ``_shift_sum_df``)."""
    if not shifts:
        z = jnp.zeros_like(a[0])
        return z, z, z
    out = _shift_tf(a, *shifts[0])
    for dr, dc in shifts[1:]:
        nxt = _shift_tf(a, dr, dc)
        out = (out[0] + nxt[0], out[1] + nxt[1], out[2] + nxt[2])
    return out


def _tf_mul_wconst3(v, w: float):
    """v * w for a trace-time f64 constant w (triples -> ~2^-71-accurate
    unrounded triple): exact 3-word split of w, EFT main and first-order
    cross products, f32 second-order tail (``tf32._tf_mul_words``)."""
    wh = np.float32(w)
    r = float(w) - float(wh)
    wm = np.float32(r)
    wl = np.float32(r - float(wm))
    p0, e0 = _two_prod_wconst(v[0], wh)
    p1, e1 = _two_prod_wconst(v[0], wm)
    p2, e2 = _two_prod_wconst(v[1], wh)
    t3 = v[1] * wm + v[0] * wl + v[2] * wh
    s1, d1 = two_sum(p1, p2)
    s1, d2 = two_sum(s1, e0)
    return _renorm3(p0, s1, d1 + d2 + e1 + e2 + t3)


# ---------------------------------------------------------------------------
# ef64: f64-FAITHFUL emulation on f32 triples (the knife-edge parity mode)
#
# Every op computes its result to ~2^-71 (triple EFTs) and then ROUNDS it
# to the nearest value on the f64 grid — reproducing a correctly-rounded
# IEEE f64 op except when the exact result lies within 2^-71-relative of a
# rounding boundary (a ~2^-18-probability one-ulp64 tie per op, far below
# the f64-class noise every op carries anyway). Rationale and measured
# evidence: docs/design.md §7 + experiments/f64_structure_probe.py — the
# knife-edge counts need f64's accuracy CLASS exactly (df32 overshoots,
# tf32 undershoots); order within the class is free.
# ---------------------------------------------------------------------------

_EF_C23 = np.float32(2.0**-23)
_EF_CF = np.float32(1.5 * 2.0**-6)
_EF_CB = np.float32(1.5)


def _ef_round(x):
    """Round a canonical triple to the nearest f64-grid value, bitcast-free
    (Mosaic-scalar-safe — SMEM values use the same routine as vectors).

    With ``x = (a0, a1, a2)`` canonical (|a1| <= ulp(a0)/2), the f64
    rounding cut sits at ``2^(e0-52)`` where ``e0 = exponent(a0)``:

    1. extract ``P = 2^(e0-23)`` EXACTLY via the add-peeling trick
       (``r = RN(|a0| + |a0|*2^-23) - |a0|`` is ``k*2^(e0-23)``, k in
       {1,2}, and ``k=1  <=>  r <= |a0|*2^-23``),
    2. split the tail ``z = a1 (+) a2`` exactly at grid ``2^(e0-46)``
       with the constant ``1.5*P`` (|z| <= 0.75*2^(e0-23) keeps the sum
       in P's binade, so the subtraction is Sterbenz-exact),
    3. round the sub-grid remainder at ``2^(e0-52)`` with ``1.5*P*2^-6``.

    Zero / subnormal ``a0`` degrade to a no-op (value preserved), which
    only affects magnitudes far below every tolerance in play. The result
    components are exact multiples of the grid, so follow-on EFT ops see
    a genuine f64 value.
    """
    a0, a1, a2 = x
    a = jnp.abs(a0)
    q = a * _EF_C23
    r = (a + q) - a  # exact: k * 2^(e0-23)
    P = jnp.where(r <= q, r, 0.5 * r)  # 2^(e0-23) exactly
    CB = P * _EF_CB
    CF = P * _EF_CF
    z1, z2 = two_sum(a1, a2)
    t_hi = (z1 + CB) - CB  # z1 rounded to grid 2^(e0-46), remainder exact
    d = z1 - t_hi
    u = d + z2
    t_lo = (u + CF) - CF  # remainder rounded at the f64 cut 2^(e0-52)
    return a0, t_hi, t_lo


def _e_add(x, y):
    return _ef_round(_tf_add3(x, y))


def _e_sub(x, y):
    return _ef_round(_tf_add3(x, (-y[0], -y[1], -y[2])))


def _e_mul(x, y):
    return _ef_round(_tf_prod3(x, y))


def _e_mul_wconst(v, w: float):
    return _ef_round(_tf_mul_wconst3(v, w))


def _e_div(a, b):
    """Faithful f64 division a / b (triples; two Newton corrections reach
    ~2^-70 before the grid rounding)."""
    b0s = jnp.where(jnp.abs(b[0]) > 0.0, b[0], 1.0)
    q0 = a[0] / b0s
    r = _tf_add3(a, _tf_neg_prod(q0, b))
    q1 = (r[0] + r[1]) / b0s
    r2 = _tf_add3(a, _tf_neg_prod2(q0, q1, b))
    q2 = (r2[0] + r2[1]) / b0s
    return _ef_round(_renorm3(q0, q1, q2))


def _tf_neg_prod(q0, b):
    """-(q0 * b) as an unrounded triple (q0 a bare f32)."""
    t = _tf_prod3((q0, jnp.zeros_like(q0), jnp.zeros_like(q0)), b)
    return (-t[0], -t[1], -t[2])


def _tf_neg_prod2(q0, q1, b):
    """-((q0 + q1) * b) as an unrounded triple."""
    z = jnp.zeros_like(q0)
    t = _tf_prod3(_renorm3(q0, q1, z), b)
    return (-t[0], -t[1], -t[2])


def _e_sqrt(a):
    """Faithful f64 square root (triples; two Newton corrections)."""
    s0 = jnp.sqrt(jnp.maximum(a[0], 0.0))
    safe = jnp.where(s0 > 0.0, 2.0 * s0, 1.0)
    p, pe = two_prod(s0, s0)
    r = _tf_add3(a, (-p, -pe, jnp.zeros_like(p)))
    c1 = jnp.where(s0 > 0.0, (r[0] + r[1]) / safe, 0.0)
    z = jnp.zeros_like(s0)
    sq = _tf_prod3(_renorm3(s0, c1, z), _renorm3(s0, c1, z))
    r2 = _tf_add3(a, (-sq[0], -sq[1], -sq[2]))
    c2 = jnp.where(s0 > 0.0, (r2[0] + r2[1]) / safe, 0.0)
    return _ef_round(_renorm3(s0, c1, c2))


def _e_gt(a, b):
    """a > b for f64-grid triples (componentwise lexicographic)."""
    return (
        (a[0] > b[0])
        | ((a[0] == b[0]) & (a[1] > b[1]))
        | ((a[0] == b[0]) & (a[1] == b[1]) & (a[2] > b[2]))
    )


def _e_abs(a):
    neg = a[0] < 0.0
    return (
        jnp.where(neg, -a[0], a[0]),
        jnp.where(neg, -a[1], a[1]),
        jnp.where(neg, -a[2], a[2]),
    )


def _stencil_applier(st: np.ndarray):
    """Trace-time plan for applying a constant stencil to shifted df sums:
    returns ``(scale, active, tap)`` where ``active`` is the set of stencil
    indices with work and ``tap(acc, sidx, sh)`` accumulates that tap's
    contribution, with the accumulator in ``scale``-units (the caller folds
    ``scale`` into its final field weights).

    Fast path (every uniform-grid Q1/P1 stencil — see
    ``df32.dyadic_factor``): ``st = c * dyadic + residual`` with sub-noise
    taps dropped, applied via ``_acc_tap``. General path (non-dyadic
    stencils): per-tap split-constant EFT ``_axpy_const`` at scale 1."""
    fac = dyadic_factor(st)
    if fac is not None:
        c, D, R, terms_by_tap = fac
        plan = {}
        for sidx in np.ndindex(st.shape):
            m = float(D[sidx])
            r = 0.0 if R is None else float(R[sidx])
            if m == 0.0 and r == 0.0:
                continue
            plan[sidx] = (terms_by_tap.get(sidx, ()), m, r / c)

        def tap(acc, sidx, sh):
            return _acc_tap(acc, plan[sidx], sh)

        return c, frozenset(plan), tap

    active = frozenset(  # pragma: no cover - no published config hits this
        sidx for sidx in np.ndindex(st.shape) if float(st[sidx]) != 0.0
    )

    def tap_general(acc, sidx, sh):  # pragma: no cover
        return _axpy_const(acc, float(st[sidx]), sh)

    return 1.0, active, tap_general


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


def build_packed_ilu(geo, op):
    """Host-side construction of the packed structured-ILU(0) data.

    Returns ``(consts, meta)``: ``consts = (coeffs, lvmap, diag,
    coeffs_lo)`` to pass as kernel inputs (Pallas kernels may not capture
    array constants) — ``coeffs`` is ``(n_offs, Rp, Wp)`` f32 factor planes
    (one per structural offset, entries placed at each row's packed
    position), ``lvmap`` the wavefront level index per packed position (-1
    outside the grid), ``diag`` the U diagonal (1.0 outside), ``coeffs_lo``
    the low f32 words of the f64 factor (for the df defect-corrected
    apply) — and ``meta = (lower, upper, shifts, nlev, center)`` with
    static offset index lists (preserving ``StructuredILU0._sweep``'s
    accumulation order), packed (drow, dlane) shifts, the level count, and
    the center-offset index.

    Mirrors ``ops/ilu.StructuredILU0`` exactly: same host factorization
    (``ilu0_factorize``), same unit-lower L / diagonal-scaled U wavefront
    semantics — golden iteration counts (5/11/20 at 2D N=4/16/32) carry
    over; the monolithic apply is df-grade (make_ilu_apply_df), which the
    knife-edge N=64 count (42) needs.
    """
    from perphil_tpu.ops.ilu import build_monolithic_system, ilu0_factorize

    sys = build_monolithic_system(op.mesh, op.params)
    fac64 = np.where(sys.valid, np.asarray(ilu0_factorize(sys), np.float64), 0.0)
    fac = fac64.astype(np.float32)
    fac_lo = (fac64 - fac.astype(np.float64)).astype(np.float32)
    n = sys.n_nodes
    shape = tuple(op.mesh.node_shape)
    dim = len(shape)
    Rp, Wp = geo.Rp, geo.Wp

    # packed position of every flat row (field-major: row = f*n + node)
    node_idx = np.arange(n)
    multi = np.stack(np.unravel_index(node_idx, shape), axis=1)  # slowest-first
    if dim == 2:
        zz = np.zeros(n, np.int64)
        yy, xx = multi[:, 0], multi[:, 1]
    else:
        zz, yy, xx = multi[:, 0], multi[:, 1], multi[:, 2]
    pr = np.empty(2 * n, np.int64)
    pc_ = np.empty(2 * n, np.int64)
    for f in (0, 1):
        base = f * geo.Fr + zz * geo.hrow + 1
        pr[f * n : (f + 1) * n] = base + yy
        pc_[f * n : (f + 1) * n] = 1 + xx

    n_offs = fac.shape[1]
    coeffs = np.zeros((n_offs, Rp, Wp), np.float32)
    coeffs_lo = np.zeros((n_offs, Rp, Wp), np.float32)
    for t in range(n_offs):
        coeffs[t, pr, pc_] = fac[:, t]
        coeffs_lo[t, pr, pc_] = fac_lo[:, t]
    lvmap = np.full((Rp, Wp), -1, np.int32)
    for i, rows in enumerate(sys.levels):
        lvmap[pr[rows], pc_[rows]] = i
    diag = np.ones((Rp, Wp), np.float32)
    diag[pr, pc_] = fac[:, sys.center_index]

    # packed shifts: col = row + delta -> position shift
    # (field_delta*Fr + dz*hrow + dy, dx)
    shifts = []
    for t in range(n_offs):
        g = sys.geoms[t]  # coordinate order (dx, dy[, dz])
        dx, dy = int(g[0]), int(g[1])
        dz = int(g[2]) if dim == 3 else 0
        shifts.append((int(sys.blocks[t]) * geo.Fr + dz * geo.hrow + dy, dx))
    lower = tuple(t for t in range(n_offs) if int(sys.deltas[t]) < 0)
    upper = tuple(t for t in range(n_offs) if int(sys.deltas[t]) > 0)
    consts = (
        jnp.asarray(coeffs),
        jnp.asarray(lvmap),
        jnp.asarray(diag),
        jnp.asarray(coeffs_lo),
    )
    meta = (lower, upper, tuple(shifts), len(sys.levels), int(sys.center_index))
    return consts, meta


def make_ilu_apply(meta):
    """Kernel-side z = U^{-1} L^{-1} r on packed f32 buffers via masked
    wavefront level sweeps: each level recomputes the full (cheap,
    in-kernel) stencil update and commits only its own rows — in-kernel
    iterations are nearly free on this backend, so ~2*nlev masked passes
    beat any XLA-level scheduling of the same recurrence."""
    lower, upper, shifts, nlev, _center = meta

    def apply(r, coeffs, lvmap, diag):
        zero = jnp.zeros_like(r)

        def lbody(lv, z):
            acc = r
            for t in lower:
                acc = acc - coeffs[t] * _shift(z, *shifts[t])
            return jnp.where(lvmap == lv, acc, z)

        y = _fori(nlev, lbody, zero)

        def ubody(i, z):
            lv = jnp.int32(nlev - 1) - i
            acc = y
            for t in upper:
                acc = acc - coeffs[t] * _shift(z, *shifts[t])
            acc = acc / diag
            return jnp.where(lvmap == lv, acc, z)

        return _fori(nlev, ubody, zero)

    return apply


def make_ilu_apply_df(meta):
    """Kernel-side DOUBLE-FLOAT z = M^{-1} r (M = LU, the f64-factored
    structured ILU(0)): f32 wavefront trisolves + one defect-correction
    pass against the df-stored factor planes. The applied preconditioner
    matches PETSc's f64 ILU to ~1e-14 — required at convergence knife
    edges (the fused 2D N=64 GMRES+ILU cell drifts to 43 with a plain f32
    apply; PETSc: 42 — docs/design.md §7) while every trisolve stays an
    f32 masked sweep. Same policy as the XLA path's
    ``StructuredILU0.apply_flat_df``."""
    lower, upper, shifts, nlev, center = meta
    base = make_ilu_apply(meta)

    def _tap_df(acc, ch, cl, z_df, sh):
        zh = _shift(z_df[0], *sh)
        zl = _shift(z_df[1], *sh)
        p, e = two_prod(ch, zh)
        e = e + ch * zl + cl * zh
        return df_add(acc, fast_two_sum(p, e))

    def apply_df(v_df, coeffs, lvmap, diag, coeffs_lo):
        z32 = base(v_df[0] + v_df[1], coeffs, lvmap, diag)
        z = (z32, jnp.zeros_like(z32))
        # M z = L(U z) in df: U = stored diag + uppers, L = unit-lower
        uz = _tap_df(
            (jnp.zeros_like(z32), jnp.zeros_like(z32)),
            coeffs[center], coeffs_lo[center], z, (0, 0),
        )
        for t in upper:
            uz = _tap_df(uz, coeffs[t], coeffs_lo[t], z, shifts[t])
        mz = uz
        for t in lower:
            mz = _tap_df(mz, coeffs[t], coeffs_lo[t], uz, shifts[t])
        s = df_sub(v_df, mz)
        c32 = base(s[0] + s[1], coeffs, lvmap, diag)
        return df_add(z, (c32, jnp.zeros_like(c32)))

    return apply_df


def build_packed_field_ilu(geo, op):
    """Per-FIELD structured ILU(0) packed data (the fieldsplit inner-block
    preconditioners): field f's factor planes occupy field f's packed rows,
    so ONE masked wavefront sweep serves whichever block the (field-masked)
    input lives in. Same format/consumer as :func:`build_packed_ilu` /
    :func:`make_ilu_apply`."""
    from perphil_tpu.ops.ilu import build_field_system, ilu0_factorize

    p = op.params
    systems = [
        build_field_system(op.mesh, float(p.k1), float(p.beta), float(p.mu)),
        build_field_system(op.mesh, float(p.k2), float(p.beta), float(p.mu)),
    ]
    shape = tuple(op.mesh.node_shape)
    dim = len(shape)
    Rp, Wp = geo.Rp, geo.Wp
    n = systems[0].n_nodes
    node_idx = np.arange(n)
    multi = np.stack(np.unravel_index(node_idx, shape), axis=1)
    if dim == 2:
        zz = np.zeros(n, np.int64)
        yy, xx = multi[:, 0], multi[:, 1]
    else:
        zz, yy, xx = multi[:, 0], multi[:, 1], multi[:, 2]

    s0 = systems[0]
    n_offs = s0.vals.shape[1]
    coeffs = np.zeros((n_offs, Rp, Wp), np.float32)
    lvmap = np.full((Rp, Wp), -1, np.int32)
    diag = np.ones((Rp, Wp), np.float32)
    nlev = 0
    for f, sys in enumerate(systems):
        fac = np.asarray(ilu0_factorize(sys), np.float64)
        fac = np.where(sys.valid, fac, 0.0).astype(np.float32)
        pr = f * geo.Fr + zz * geo.hrow + 1 + yy
        pc_ = 1 + xx
        for t in range(n_offs):
            coeffs[t, pr, pc_] = fac[:, t]
        for i, rows in enumerate(sys.levels):
            lvmap[pr[rows], pc_[rows]] = i
        diag[pr, pc_] = fac[:, sys.center_index]
        nlev = max(nlev, len(sys.levels))

    shifts = []
    for t in range(n_offs):
        g = s0.geoms[t]
        dx, dy = int(g[0]), int(g[1])
        dz = int(g[2]) if dim == 3 else 0
        shifts.append((dz * geo.hrow + dy, dx))
    lower = tuple(t for t in range(n_offs) if int(s0.deltas[t]) < 0)
    upper = tuple(t for t in range(n_offs) if int(s0.deltas[t]) > 0)
    consts = (jnp.asarray(coeffs), jnp.asarray(lvmap), jnp.asarray(diag))
    meta = (lower, upper, tuple(shifts), nlev, int(s0.center_index))
    return consts, meta


def build_packed_field_fastdiag(geo, op):
    """Per-field fast-diagonalization preconditioner on the packed layout
    (the fieldsplit "exact LU" block role): interior tensor solves with the
    consistent 1D eigenbasis on quad/hex meshes, the lumped proxy on
    simplicial ones (where it preconditions an inner CG to 1e-13, mirroring
    ``solvers/solver._monolithic_direct``'s PCG substitution). Returns
    ``(consts, apply)`` with ``consts`` as kernel inputs and
    ``apply(v, consts) -> (Rp, Wp)`` (identity on boundary rows)."""
    from perphil_tpu.ops.direct import FastDiagFieldSolver

    p = op.params
    lumped = not getattr(op.mesh, "is_tensor_product", False)
    fs = [
        FastDiagFieldSolver(op.mesh, float(p.k1), float(p.beta), float(p.mu), lumped=lumped),
        FastDiagFieldSolver(op.mesh, float(p.k2), float(p.beta), float(p.mu), lumped=lumped),
    ]
    eig = fs[0]._eig  # 1D eigenpairs are field-independent
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
    consts = (
        jnp.asarray(Sx), jnp.asarray(Sx.T.copy()),
        jnp.asarray(Sy), jnp.asarray(Sy.T.copy()),
        jnp.asarray(sc1), jnp.asarray(sc2),
    )
    Rp, Wp = geo.Rp, geo.Wp
    hi = jax.lax.Precision.HIGHEST

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

    def apply(v, mats, bmask):
        Sx_c, SxT_c, Sy_c, SyT_c, S1g, S2g = mats
        out = v * bmask  # identity boundary rows
        for f, Sg in ((0, S1g), (1, S2g)):
            t = [
                jnp.dot(
                    jnp.dot(
                        SyT_c,
                        v[geo._base_row(f, q) + 1 : geo._base_row(f, q) + 1 + iy, 2 : 2 + ix],
                        precision=hi,
                    ),
                    Sx_c,
                    precision=hi,
                )
                for q in zplanes
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

    return consts, apply


def build_packed_coupling(geo, op):
    """In-kernel off-diagonal block apply C: (field0-supported df) ->
    (field1 rows): interior-masked ``-(beta/mu) M z`` (mirrors
    ``solvers/solver._coupling_apply_df``)."""
    _, M_st = compile_stencils(op.mesh)
    M_st = np.asarray(M_st, np.float64)
    bw = float(op.params.beta / op.params.mu)
    Rp, Wp, Fr = geo.Rp, geo.Wp, geo.Fr

    # same dyadic exact tap loop as build_packed_matvec
    cM, actM, tapM = _stencil_applier(M_st)
    bs = bw * cM

    def C(z, imask):
        zi = _df_mask(z, imask)
        zero = (jnp.zeros((Rp, Wp), jnp.float32), jnp.zeros((Rp, Wp), jnp.float32))
        Mz = zero
        for sidx, shifts in geo.offsets():
            if sidx not in actM:
                continue
            Mz = tapM(Mz, sidx, _shift_sum_df(zi, shifts))
        dr_f, dc_f = geo.field_shift
        sw = (_shift(Mz[0], -dr_f, -dc_f), _shift(Mz[1], -dr_f, -dc_f))
        out = _axpy_const(zero, -bs, sw)
        return _df_mask(out, imask)

    return C


def build_packed_matvec(geo, op, coupling: bool = True):
    """In-kernel packed df matvec with symmetric BC elimination for the
    DPP operator (mirrors DPPOperator.matvec, ``ops/assembly.py:192-212``).
    Shared by the fused GMRES and fused direct-solve kernels. Returns
    ``matvec(z, imask, bmask, fmask) -> df pair``. With ``coupling=False``
    the cross-field mass term is dropped: the result is the block-diagonal
    operator diag((k1/mu)K + (beta/mu)M, (k2/mu)K + (beta/mu)M) — the
    fieldsplit inner-block systems."""
    K_st, M_st = compile_stencils(op.mesh)
    K_st = np.asarray(K_st, np.float64)
    M_st = np.asarray(M_st, np.float64)
    p = op.params
    k1w, k2w, bw = float(p.k1 / p.mu), float(p.k2 / p.mu), float(p.beta / p.mu)
    Rp, Wp, Fr = geo.Rp, geo.Wp, geo.Fr

    # Dyadic exact-product tap loop (same trick as
    # ``df32.df_apply_stencil``'s fast path): every uniform-grid Q1/P1
    # stencil factors as c * dyadic + ulp-residual (``dyadic_factor``), so
    # the per-tap accumulation needs no two_prod — each pow2 term product
    # is exact — and the factored-out c folds into the (already present)
    # final field scales. ~2x fewer VPU ops per matvec (incl. dropping the
    # P1-tet stiffness noise taps). Falls back to the general per-tap-EFT
    # path for non-dyadic (anisotropic) stencils.
    cK, actK, tapK = _stencil_applier(K_st)
    cM, actM, tapM = _stencil_applier(M_st)
    k1s, k2s, bs = k1w * cK, k2w * cK, bw * cM

    def _matvec(z, imask, bmask, fmask):
        zi = _df_mask(z, imask)
        zero = (jnp.zeros((Rp, Wp), jnp.float32), jnp.zeros((Rp, Wp), jnp.float32))
        Kz = zero
        Mz = zero
        for sidx, shifts in geo.offsets():
            if sidx not in actK and sidx not in actM:
                continue
            sh = _shift_sum_df(zi, shifts)
            if sidx in actK:
                Kz = tapK(Kz, sidx, sh)
            if sidx in actM:
                Mz = tapM(Mz, sidx, sh)
        Kz1 = _df_mask(Kz, fmask)
        Kz2 = _df_mask(Kz, 1.0 - fmask)
        y = zero
        y = _axpy_const(y, k1s, Kz1)
        y = _axpy_const(y, k2s, Kz2)
        y = _axpy_const(y, bs, Mz)
        if coupling:
            # swap field blocks of Mz (the coupling term reads the OTHER
            # field's mass application); field_shift is the packed
            # field-0 -> field-1 displacement (sublane or lane stacking)
            dr_f, dc_f = geo.field_shift
            swap = (
                _shift(Mz[0], -dr_f, -dc_f) + _shift(Mz[0], dr_f, dc_f),
                _shift(Mz[1], -dr_f, -dc_f) + _shift(Mz[1], dr_f, dc_f),
            )
            y = _axpy_const(y, -bs, swap)
        return df_add(_df_mask(y, imask), _df_mask(z, bmask))

    return _matvec


def build_packed_matvec_ef64(geo, op):
    """In-kernel packed ef64 (f64-faithful) matvec with symmetric BC
    elimination — the knife-edge twin of ``build_packed_matvec``: same
    geometry/offset plan, but every tap product and accumulation is an
    individually grid-rounded f64-grade op (matching the accuracy class of
    the native ``DPPOperator.matvec``, whose order-robustness the
    ``f64_structure_probe`` established). Used by the fused ef64 GMRES
    only (pc none), so no ``coupling=False`` variant."""
    K_st, M_st = compile_stencils(op.mesh)
    K_st = np.asarray(K_st, np.float64)
    M_st = np.asarray(M_st, np.float64)
    p = op.params
    k1w, k2w, bw = float(p.k1 / p.mu), float(p.k2 / p.mu), float(p.beta / p.mu)
    Rp, Wp = geo.Rp, geo.Wp
    actK = {s for s in np.ndindex(K_st.shape) if float(K_st[s]) != 0.0}
    actM = {s for s in np.ndindex(M_st.shape) if float(M_st[s]) != 0.0}

    formulation = os.environ.get("PERPHIL_TPU_EF64_MATVEC", "diff")
    dr_f, dc_f = geo.field_shift

    def _swap3(c3):
        return tuple(
            _shift(c, -dr_f, -dc_f) + _shift(c, dr_f, dc_f) for c in c3
        )

    def _apply_st(st, act, zi):
        zp = jnp.zeros((Rp, Wp), jnp.float32)
        acc = (zp, zp, zp)
        for sidx, shifts in geo.offsets():
            if sidx not in act:
                continue
            sh = _shift_sum_tf(zi, shifts)
            acc = _e_add(acc, _e_mul_wconst(sh, float(st[sidx])))
        return acc

    def _matvec(z, imask, bmask, fmask):
        zi = _tf_mask3(z, imask)
        Kz = _apply_st(K_st, actK, zi)
        Kz1 = _tf_mask3(Kz, fmask)
        Kz2 = _tf_mask3(Kz, 1.0 - fmask)
        y = _e_add(_e_mul_wconst(Kz1, k1w), _e_mul_wconst(Kz2, k2w))
        if formulation == "diff":
            # native DPPOperator.matvec order: the cross-field difference
            # FIRST, one mass application, one weighted accumulate (the
            # packed zdiff carries each field's signed difference)
            zdiff = _e_sub(zi, _swap3(zi))
            Md = _apply_st(M_st, actM, zdiff)
            y = _e_add(y, _e_mul_wconst(Md, bw))
        else:  # "swapw": mass per field, weight, then cross-subtract
            Mz = _apply_st(M_st, actM, zi)
            y = _e_add(y, _e_mul_wconst(Mz, bw))
            y = _e_sub(y, _e_mul_wconst(_swap3(Mz), bw))
        # identity boundary rows: images disjoint, the component add is exact
        yi = _tf_mask3(y, imask)
        zb = _tf_mask3(z, bmask)
        return (yi[0] + zb[0], yi[1] + zb[1], yi[2] + zb[2])

    return _matvec


# ---------------------------------------------------------------------------
# packed-layout geometry
# ---------------------------------------------------------------------------


class _Geometry:
    """Static packing data for one mesh.

    ``group`` > 1 lane-packs that many z-planes side by side (each plane in
    a ``cols + 2``-lane slot incl. x halos), shrinking the padded canvas by
    ~``group``x. Narrow 3D grids (cols + 2 << 128 lanes) are otherwise
    lane-starved: the whole per-iteration VPU cost (CGS dots, axpys, norms)
    scales with the padded canvas, not the DoF count. A dz stencil shift
    then needs up to two zero-fill shifts — in-group (pure lane shift by
    ``dz*sw``) plus cross-block (sublane ``dz*hrow``, lane
    ``-dz*(group-1)*sw``) — whose contributions land on disjoint real
    positions, so they combine with a plain add (see ``offsets``)."""

    def __init__(
        self,
        node_shape: Tuple[int, ...],
        bdry: np.ndarray,
        group: int = 1,
        field_lanes: bool = False,
    ):
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
        self.sw = cols + 2  # lane slot width incl. left/right halo
        self.Wp = _LANES
        # field-lane stacking (2D): the two field grids sit side by side
        # in lanes instead of stacked in sublanes — halves the canvas for
        # cols <= 62. The field-coupling "swap" becomes a +-sw lane shift.
        self.field_lanes = (
            bool(field_lanes) and dim == 2 and 2 * self.sw <= self.Wp
        )
        group = max(1, min(int(group), planes, self.Wp // self.sw))
        self.group = group
        self.nblocks = -(-planes // group)  # ceil
        self.Fr = self.nblocks * self.hrow  # rows per field block
        self.Rp = _next_pow2((1 if self.field_lanes else 2) * self.Fr)
        # packed (drow, dlane) displacement from a field-0 position to the
        # corresponding field-1 position (the coupling swap shift)
        self.field_shift = (0, self.sw) if self.field_lanes else (self.Fr, 0)
        if self.sw > self.Wp:
            raise ValueError("field too wide for the fused kernel")

        def base_row(f: int, p: int) -> int:
            fr = 0 if self.field_lanes else f * self.Fr
            return fr + (p // group) * self.hrow + 1

        def base_lane(f: int, p: int) -> int:
            fl = f if self.field_lanes else 0
            return ((p % group) + fl) * self.sw + 1

        self._base_row = base_row
        self._base_lane = base_lane

        bmask = np.zeros((self.Rp, self.Wp), np.float32)
        imask = np.zeros((self.Rp, self.Wp), np.float32)
        interior = ~bdry
        for f in range(2):
            for p in range(planes):
                r0 = base_row(f, p)
                c0 = base_lane(f, p)
                sl = (p,) if dim == 3 else ()
                bmask[r0 : r0 + rows, c0 : c0 + cols] = bdry[sl].astype(
                    np.float32
                )
                imask[r0 : r0 + rows, c0 : c0 + cols] = interior[sl].astype(
                    np.float32
                )
        # field-0 selector (for per-field permeability weights)
        fmask = np.zeros((self.Rp, self.Wp), np.float32)
        if self.field_lanes:
            fmask[:, : self.sw] = 1.0
        else:
            fmask[: self.Fr, :] = 1.0
        self.bmask, self.imask, self.fmask = bmask, imask, fmask

    def offsets(self):
        """3^d stencil index -> list of packed (drow, dlane) zero-fill
        shifts whose summed contributions realize that stencil offset.

        Grouped dz != 0 offsets decompose into an in-group lane shift
        (plane slot g -> g+dz; edge slots fall off into halo/pad lanes,
        which the final interior mask kills) and a cross-block shift
        (slot group-1 of block b -> slot 0 of block b+1 for dz=+1; every
        other slot's image lands outside the real slots — negative lanes
        are clipped by the zero-fill shift, overshoots land in pad lanes —
        so no extra masking is needed). The two images are disjoint on
        real data positions, hence a plain (exact) df component add."""
        if self.dim == 2:
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yield (dy + 1, dx + 1), [(dy, dx)]
            return
        G = self.group
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dz == 0:
                        sh = [(dy, dx)]
                    else:
                        sh = []
                        if G > 1:
                            sh.append((dy, dz * self.sw + dx))
                        if self.nblocks > 1:
                            sh.append(
                                (
                                    dz * self.hrow + dy,
                                    dx - dz * (G - 1) * self.sw,
                                )
                            )
                    yield (dz + 1, dy + 1, dx + 1), sh

    def pack(self, z):
        """(2, *node_shape) f32 -> (Rp, Wp) packed.

        The packed layout is fields x blocks x (1 halo row + rows + 1 halo
        row), with ``group`` plane slots side by side per block row, so a
        single pad+reshape+transpose produces it — O(1) HLO ops instead of
        2*planes dynamic_update_slices (each executed op carries real
        per-dispatch cost on this backend)."""
        G, NB = self.group, self.nblocks
        if self.field_lanes:
            z3 = z.astype(jnp.float32).reshape(2, self.rows, self.cols)
            zp = jnp.pad(z3, ((0, 0), (1, 1), (1, 1)))  # (2, hrow, sw)
            flat = zp.transpose(1, 0, 2).reshape(self.hrow, 2 * self.sw)
            return jnp.pad(
                flat,
                ((0, self.Rp - self.hrow), (0, self.Wp - 2 * self.sw)),
            )
        z4 = z.astype(jnp.float32).reshape(2, self.planes, self.rows, self.cols)
        zp = jnp.pad(
            z4, ((0, 0), (0, NB * G - self.planes), (1, 1), (1, 1))
        )
        z5 = zp.reshape(2, NB, G, self.hrow, self.sw).transpose(0, 1, 3, 2, 4)
        flat = z5.reshape(2 * self.Fr, G * self.sw)
        return jnp.pad(
            flat, ((0, self.Rp - 2 * self.Fr), (0, self.Wp - G * self.sw))
        )

    def unpack(self, buf):
        """(Rp, Wp) packed -> (2, *node_shape) f32."""
        G, NB = self.group, self.nblocks
        if self.field_lanes:
            body = buf[: self.hrow, : 2 * self.sw]
            z3 = body.reshape(self.hrow, 2, self.sw).transpose(1, 0, 2)
            return z3[:, 1:-1, 1 : 1 + self.cols].reshape(
                (2,) + self.node_shape
            )
        body = buf[: 2 * self.Fr, : G * self.sw]
        z5 = body.reshape(2, NB, self.hrow, G, self.sw).transpose(0, 1, 3, 2, 4)
        z4 = z5[:, :, :, 1:-1, 1 : 1 + self.cols].reshape(
            2, NB * G, self.rows, self.cols
        )
        return z4[:, : self.planes].reshape((2,) + self.node_shape)


@lru_cache(maxsize=32)
def _geometry_cached(
    node_shape: Tuple[int, ...],
    bdry_bytes: bytes,
    group: int = 1,
    field_lanes: bool = False,
) -> _Geometry:
    bdry = np.frombuffer(bdry_bytes, dtype=np.bool_).reshape(node_shape)
    return _Geometry(node_shape, bdry, group=group, field_lanes=field_lanes)


def _plane_group(node_shape: Tuple[int, ...]) -> int:
    """Lane-packing group for narrow 3D grids (see _Geometry). Only the
    plain/jacobi fused paths use it: the in-kernel ILU trisolves and the
    fieldsplit fast-diag plane dots assume the one-slot layout."""
    if len(node_shape) != 3:
        return 1
    planes, _, cols = node_shape
    return max(1, min(int(planes), _LANES // (int(cols) + 2)))


def _use_field_lanes(node_shape: Tuple[int, ...]) -> bool:
    """2D field-lane stacking (see _Geometry): both field grids fit side
    by side in the 128 lanes. Same pc restriction as _plane_group.

    Gated to grids whose sublane-stacked canvas is at least 128 rows:
    below that the per-iteration cost is dominated by fixed kernel
    overhead, the halved canvas buys <15% (measured: 2D N=16 1.14x,
    N=32 1.59x), and keeping the small grids on the original layout
    preserves their bit-exact published iteration trajectories."""
    if len(node_shape) != 2:
        return False
    rows, cols = int(node_shape[0]), int(node_shape[1])
    return 2 * (cols + 2) <= _LANES and _next_pow2(2 * (rows + 2)) >= 128


def _geometry(op, group: int = 1, field_lanes: bool = False) -> _Geometry:
    bdry = np.ascontiguousarray(np.asarray(op.mesh.boundary_mask(), np.bool_))
    return _geometry_cached(
        tuple(op.mesh.node_shape), bdry.tobytes(), int(group), bool(field_lanes)
    )


def fused_gmres_supported(op, pc_type: str = "none") -> bool:
    """Whether the operator fits the fused small-problem cycle kernel.

    Default-on only on TPU-class backends: on CPU the kernel runs in Pallas
    interpret mode (orders of magnitude slower than the XLA path, and
    subject to the CPU EFT-contraction hazard — see ``ops/df32``).
    ``PERPHIL_TPU_FUSED_GMRES=force`` opts in anyway (validation tests,
    which must also compile with ``eft_safe_compiler_options()``).
    ``pc_type`` folds the preconditioner's VMEM tenants (ILU coefficient
    planes) into the budget so near-limit grids fall back to the XLA path
    instead of failing the Mosaic scoped-vmem check at dispatch time.
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
    lane_packed = pc_type in ("none", "jacobi")
    group = _plane_group(ns) if lane_packed else 1
    nblocks = -(-planes // group)
    nf = 1 if (lane_packed and _use_field_lanes(ns)) else 2
    Rp = _next_pow2(nf * nblocks * (rows + 2))
    vbytes = 2 * 32 * Rp * _LANES * 4  # hi+lo basis (pow2-padded) dominates VMEM
    if pc_type in ("ilu", "fieldsplit_ilu"):
        # per-offset factor coefficient planes (3 block-deltas for the
        # monolithic ILU, 1 for the per-field fieldsplit blocks)
        n_offs = (3 ** len(ns)) * (3 if pc_type == "ilu" else 1)
        vbytes += n_offs * Rp * _LANES * 4
    return vbytes <= _VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# the fused restart-cycle kernel
# ---------------------------------------------------------------------------


def _build_cycle(op, m: int, debug: bool = False, pc_type: str = "none"):
    """Returns ``(solve_call, geo)`` where ``solve_call`` runs a whole
    (optionally left-preconditioned) GMRES(m) solve as a single
    pallas_call. ``debug`` adds V/R/g/y dumps to the outputs
    (numerics-validation harness only)."""
    # plain/jacobi solves use the lane-packed layouts (grouped z-planes in
    # 3D, field-lane stacking in 2D — up to ~8x smaller VPU canvas); the
    # ILU/fieldsplit builders assume the one-slot sublane-stacked layout
    ns = tuple(op.mesh.node_shape)
    lane_packed = pc_type in ("none", "jacobi")
    geo = _geometry(
        op,
        group=_plane_group(ns) if lane_packed else 1,
        field_lanes=lane_packed and _use_field_lanes(ns),
    )
    Rp, Wp = geo.Rp, geo.Wp
    m1 = m + 1
    mS = _next_pow2(m1)  # basis rows padded to a power of two: zero rows
    # make the batched basis reductions exact halving trees
    nS = m1 + 1  # SMEM vector extent (index j+1 <= m fits with slack)
    cgs2 = os.environ.get("PERPHIL_TPU_FUSED_CGS2", "1").lower() not in (
        "0",
        "false",
    )
    _matvec = build_packed_matvec(geo, op)
    if pc_type == "ilu":
        ilu_consts, ilu_meta = build_packed_ilu(geo, op)
        ilu_apply_df = make_ilu_apply_df(ilu_meta)
    elif pc_type == "fieldsplit_ilu":
        ilu_consts, ilu_meta = build_packed_field_ilu(geo, op)
        ilu_apply = make_ilu_apply(ilu_meta)
        _field_mv = build_packed_matvec(geo, op, coupling=False)
        _coupling = build_packed_coupling(geo, op)
    elif pc_type == "fieldsplit_lu":
        ilu_consts, _fd_apply = build_packed_field_fastdiag(geo, op)
        _field_mv = build_packed_matvec(geo, op, coupling=False)
        _coupling = build_packed_coupling(geo, op)
    elif pc_type == "jacobi":
        # numpy diagonal from the BC-eliminated structured system (the
        # builder runs at trace time, so op.diagonal() may be a tracer)
        from perphil_tpu.ops.ilu import build_monolithic_system

        msys = build_monolithic_system(op.mesh, op.params)
        dvals = np.asarray(msys.vals[:, msys.center_index], np.float64)
        n = msys.n_nodes
        shape = tuple(op.mesh.node_shape)
        node_idx = np.arange(n)
        multi = np.stack(np.unravel_index(node_idx, shape), axis=1)
        if geo.dim == 2:
            zz = np.zeros(n, np.int64)
            yy, xx = multi[:, 0], multi[:, 1]
        else:
            zz, yy, xx = multi[:, 0], multi[:, 1], multi[:, 2]
        dinv = np.zeros((geo.Rp, geo.Wp), np.float32)
        for f in range(2):
            fr = 0 if geo.field_lanes else f * geo.Fr
            fl = f if geo.field_lanes else 0
            pr = fr + (zz // geo.group) * geo.hrow + 1 + yy
            pc = ((zz % geo.group) + fl) * geo.sw + 1 + xx
            dinv[pr, pc] = (1.0 / dvals[f * n : (f + 1) * n]).astype(np.float32)
        ilu_consts = (jnp.asarray(dinv),)
    elif pc_type != "none":
        raise ValueError(
            f"fused GMRES supports pc none/jacobi/ilu/fieldsplit_ilu, "
            f"got {pc_type!r}"
        )
    n_pc_in = {
        "ilu": 4, "fieldsplit_ilu": 3, "jacobi": 1, "fieldsplit_lu": 6
    }.get(pc_type, 0)

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

    def _basis_dots(V, w):
        """<V[i], w> for ALL basis rows in one batched reduction ->
        (mS, 1, 1) df. One halving tree shared across the basis axis
        replaces m1 sequential per-row trees — the dominant per-iteration
        cost in the unbatched kernel (sub-lane slices carry fixed Mosaic
        relayout overhead, so op count, not flops, set the speed)."""
        wh = w[0][None]
        wl = w[1][None]
        ph, pe = two_prod(V[0], wh)
        pe = pe + V[0] * wl + V[1] * wh
        s = (ph, pe)
        R = Rp
        while R > 1:
            half = R // 2
            s = df_add(
                (s[0][:, :half], s[1][:, :half]),
                (s[0][:, half:R], s[1][:, half:R]),
            )
            R = half
        # lane butterfly all-reduce: after log2(Wp) rotate+add steps every
        # lane holds the SAME total (a balanced pairwise tree — exact df
        # semantics, deterministic). Keeping the result lane-replicated at
        # (mS, 1, Wp) sidesteps Mosaic's missing sublane+lane broadcast
        # when the totals are scaled back onto (mS, Rp, Wp) in _basis_comb.
        sh_ = Wp // 2
        while sh_ >= 1:
            rolled = (
                pltpu.roll(s[0], jnp.int32(sh_), 2),
                pltpu.roll(s[1], jnp.int32(sh_), 2),
            )
            s = df_add(s, rolled)
            sh_ //= 2
        return s  # (mS, 1, Wp), every lane = the dot value

    def _basis_comb(V, s):
        """sum_i s[i] * V[i] -> (Rp, Wp) df: broadcast df scale (sublane
        axis only — s is lane-replicated) + exact halving over the
        (power-of-two padded) basis axis."""
        t = _df_scale(V, s)
        B = mS
        while B > 1:
            half = B // 2
            t = df_add(
                (t[0][:half], t[1][:half]), (t[0][half:B], t[1][half:B])
            )
            B = half
        return t[0][0], t[1][0]

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
        (xh_ref, xl_ref, bh_ref, bl_ref, im_ref, bm_ref, fm_ref) = refs[:7]
        pc_refs = refs[7 : 7 + n_pc_in]
        (its_ref, rtol_ref, atol_ref, dtol_ref, maxit_ref) = refs[
            7 + n_pc_in : 12 + n_pc_in
        ]
        n_out = 6 + (12 if debug else 0)
        outs = refs[12 + n_pc_in : 12 + n_pc_in + n_out]
        oxh_ref, oxl_ref, oj_ref, oits_ref, orn_ref, oconv_ref = outs[:6]
        debug_refs = outs[6:] if debug else None
        (Vh_ref, Vl_ref,
         hh_ref, hl_ref, csh_ref, csl_ref, snh_ref, snl_ref, gh_ref, gl_ref,
         yh_ref, yl_ref, ch_ref, cl_ref, rn_ref, st_ref, td_ref,
         Rh_ref, Rl_ref) = refs[12 + n_pc_in + n_out :]
        imask = im_ref[:]
        bmask = bm_ref[:]
        fmask = fm_ref[:]
        b = (bh_ref[:], bl_ref[:])
        max_it = maxit_ref[0]
        if pc_type == "ilu":
            co = pc_refs[0][:]
            lvm = pc_refs[1][:]
            dgp = pc_refs[2][:]
            co_lo = pc_refs[3][:]

            def P(v):
                # df-grade monolithic ILU apply (defect-corrected f32
                # sweeps): matches PETSc's f64 ILU operator to ~1e-14 —
                # the N=64 golden count (42) needs this
                return ilu_apply_df(v, co, lvm, dgp, co_lo)
        elif pc_type == "jacobi":
            dinv_p = pc_refs[0][:]

            def P(v):
                # mirrors _monolithic_pc_df: f32 diagonal scale per df half
                return (dinv_p * v[0], dinv_p * v[1])
        elif pc_type in ("fieldsplit_ilu", "fieldsplit_lu"):
            if pc_type == "fieldsplit_ilu":
                co = pc_refs[0][:]
                lvm = pc_refs[1][:]
                dgp = pc_refs[2][:]

                def _inner_pc(v):
                    z = ilu_apply(v[0] + v[1], co, lvm, dgp)
                    return (z, jnp.zeros_like(z))

                _inner_rtol, _inner_atol, _inner_max = 1e-8, 1e-12, 50000
            else:
                fd_mats = tuple(ref[:] for ref in pc_refs)

                def _inner_pc(v):
                    z = _fd_apply(v[0] + v[1], fd_mats, bmask)
                    return (z, jnp.zeros_like(z))

                # the fieldsplit-LU role: machine-tolerance inner solves
                # (exact fast-diag PC -> CG converges in O(1) iterations on
                # tensor meshes; the lumped proxy drives it on simplicial
                # ones, mirroring _monolithic_direct's PCG substitution)
                _inner_rtol, _inner_atol, _inner_max = 1e-13, 0.0, 1000

            def _inner_pcg(rhs):
                """Inner block solve: double-float ILU(0)-preconditioned CG
                on the (SPD) field system, tolerance-matched to the inner
                GMRES_ILU preset (rtol 1e-8, atol 1e-12). The outer
                fieldsplit 4-iteration signature depends only on the inner
                solution TOLERANCE, not the inner Krylov method (verified:
                identical outer counts at 2D N=16/32 with inner CG vs
                inner GMRES), and CG needs no basis storage in-kernel."""
                rn0 = _df_sqrt(_tree_dot(rhs, rhs))
                rt_hi, rt_lo = _split_const(_inner_rtol)
                at_hi, at_lo = _split_const(_inner_atol)
                t_rel = _df_mul(rn0, (rt_hi, rt_lo))
                use_rel = _df_gt(t_rel, (at_hi, at_lo))
                tol = (
                    jnp.where(use_rel, t_rel[0], at_hi),
                    jnp.where(use_rel, t_rel[1], at_lo),
                )
                z0 = _inner_pc(rhs)
                rz0 = _tree_dot(z0, rhs)
                zero2 = (
                    jnp.zeros((Rp, Wp), jnp.float32),
                    jnp.zeros((Rp, Wp), jnp.float32),
                )
                done0 = jnp.where(
                    _df_gt(rn0, tol), jnp.int32(0), jnp.int32(1)
                )

                def body(c):
                    xh_, xl_, rh_, rl_, ph_, pl_, rzh_, rzl_, its, _done = c
                    x = (xh_, xl_)
                    r = (rh_, rl_)
                    p_ = (ph_, pl_)
                    rz = (rzh_, rzl_)
                    Ap = _field_mv(p_, imask, bmask, fmask)
                    alpha = _df_div(rz, _tree_dot(p_, Ap))
                    x = df_add(x, _df_scale(p_, alpha))
                    r = df_add(r, _df_scale(Ap, (-alpha[0], -alpha[1])))
                    z = _inner_pc(r)
                    rz_new = _tree_dot(z, r)
                    beta = _df_div(rz_new, rz)
                    p_ = df_add(z, _df_scale(p_, beta))
                    rn = _df_sqrt(_tree_dot(r, r))
                    done = jnp.logical_not(_df_gt(rn, tol))
                    done |= jnp.logical_not(jnp.isfinite(rn[0] + rn[1]))
                    return (
                        x[0], x[1], r[0], r[1], p_[0], p_[1],
                        rz_new[0], rz_new[1], its + 1,
                        jnp.where(done, jnp.int32(1), jnp.int32(0)),
                    )

                out = lax.while_loop(
                    lambda c: (c[-1] == 0) & (c[-2] < _inner_max),
                    body,
                    (
                        zero2[0], zero2[1], rhs[0], rhs[1], z0[0], z0[1],
                        rz0[0], rz0[1], jnp.int32(0), done0,
                    ),
                )
                return (out[0], out[1])

            def P(v):
                r1 = _df_mask(v, fmask)
                y1 = _inner_pcg(r1)
                r2 = df_sub(_df_mask(v, 1.0 - fmask), _coupling(y1, imask))
                y2 = _inner_pcg(r2)
                return df_add(y1, y2)
        else:

            def P(v):
                return v

        # x lives in the output refs across restart cycles (in-place state)
        oxh_ref[:] = xh_ref[:]
        oxl_ref[:] = xl_ref[:]

        # rnorm0, tol, div — the whole-solve quantities (gmres_df computes
        # these in f64 at the XLA level; here they are ~49-bit df, which
        # only matters when an estimate lands within ~1e-15 of tol).
        # Left-preconditioned like gmres_df: P wraps every residual/matvec.
        r0 = P(df_sub(b, _matvec((oxh_ref[:], oxl_ref[:]), imask, bmask, fmask)))
        beta0 = _df_sqrt(_tree_dot(r0, r0))
        rtol_p = (rtol_ref[0], rtol_ref[1])
        atol_p = (atol_ref[0], atol_ref[1])
        dtol_p = (dtol_ref[0], dtol_ref[1])
        t_rel = _df_mul(rtol_p, beta0)
        use_rel = _df_gt(t_rel, atol_p)
        tol = (
            jnp.where(use_rel, t_rel[0], atol_p[0]),
            jnp.where(use_rel, t_rel[1], atol_p[1]),
        )
        div = _df_mul(dtol_p, beta0)
        td_ref[0] = tol[0]
        td_ref[1] = tol[1]
        td_ref[2] = div[0]
        td_ref[3] = div[1]
        rn_ref[0] = beta0[0]
        rn_ref[1] = beta0[1]
        st_ref[0] = its_ref[0]  # running iteration count
        st_ref[1] = 0  # j = steps completed in the current cycle

        def one_cycle():
            x = (oxh_ref[:], oxl_ref[:])
            tol = (td_ref[0], td_ref[1])
            div = (td_ref[2], td_ref[3])

            # r = P(b - A x) ; beta = ||r||
            r = P(df_sub(b, _matvec(x, imask, bmask, fmask)))
            beta = _df_sqrt(_tree_dot(r, r))
            nz = beta[0] > 0.0
            inv = _df_div((1.0, 0.0), beta)
            inv = (jnp.where(nz, inv[0], 1.0), jnp.where(nz, inv[1], 0.0))
            v0 = _df_scale(r, inv)

            Vh_ref[:] = jnp.zeros((mS, Rp, Wp), jnp.float32)
            Vl_ref[:] = jnp.zeros((mS, Rp, Wp), jnp.float32)
            Vh_ref[0] = v0[0]
            Vl_ref[0] = v0[1]
            # SMEM accepts only scalar stores (Mosaic): zero just what can
            # be read before it is written — y (consumed by the final
            # update even when the cycle exits early) and R (the back-
            # substitution masks discard k>=j terms via where(), but an
            # uninitialized NaN would survive NaN*0 inside the masked df
            # product). Everything else (h, cs, sn, g, c) is written before
            # every read.
            for i in range(nS):
                yh_ref[i] = 0.0
                yl_ref[i] = 0.0

            def zero_R(i, carry):
                for k in range(m1):  # static columns, dynamic row
                    Rh_ref[i, k] = 0.0
                    Rl_ref[i, k] = 0.0
                return carry

            _fori(m1, zero_R, 0)
            gh_ref[0] = beta[0]
            gl_ref[0] = beta[1]
            rn_ref[0] = beta[0]
            rn_ref[1] = beta[1]
            st_ref[1] = 0

            def body(j, _):
                rnorm = (rn_ref[0], rn_ref[1])
                its = st_ref[0]
                ok = (st_ref[1] == j) & (its < max_it)
                ok &= _df_gt(rnorm, tol)
                ok &= jnp.logical_not(_df_gt(rnorm, div))

                @pl.when(ok)
                def _():
                    vj = (Vh_ref[j], Vl_ref[j])
                    w = P(_matvec(vj, imask, bmask, fmask))
                    # classical Gram-Schmidt, batched over the whole basis:
                    # zero rows beyond j contribute exactly nothing, and
                    # the projections accumulate through pairwise df trees
                    # (like dfvec.df_basis_comb) so rounding stays
                    # ~log2(m)*eps_df
                    V = (Vh_ref[:], Vl_ref[:])
                    s = _basis_dots(V, w)
                    w = df_sub(w, _basis_comb(V, s))
                    if cgs2:
                        # second Gram-Schmidt pass: restores the
                        # orthogonality the single-pass df CGS loses near
                        # stagnation (which otherwise inflates late-cycle
                        # iteration counts)
                        c = _basis_dots(V, w)
                        w = df_sub(w, _basis_comb(V, c))
                        s = df_add(s, c)
                    for j2 in range(m1):
                        hh_ref[j2] = s[0][j2, 0, 0]
                        hl_ref[j2] = s[1][j2, 0, 0]
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

                    # stored Givens rotations 0..j-1 (sequential scalars)
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

                    _fori(m, rot, 0)

                    # new rotation zeroing h[j+1]
                    a_ = (hh_ref[j], hl_ref[j])
                    b_ = (hh_ref[j + 1], hl_ref[j + 1])
                    den = _df_sqrt(df_add(_df_mul(a_, a_), _df_mul(b_, b_)))
                    dpos = den[0] > 0.0
                    den_s = (jnp.where(dpos, den[0], 1.0), den[1])
                    cn = _df_div(a_, den_s)
                    sn_ = _df_div(b_, den_s)
                    cn = (
                        jnp.where(dpos, cn[0], 1.0),
                        jnp.where(dpos, cn[1], 0.0),
                    )
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

                    _fori(m, copycol, 0)

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

            _fori(m, lambda j, c: (body(j, c), 0)[1], 0)
            j = st_ref[1]

            # back substitution y = R[:j,:j]^{-1} g[:j] (y beyond j stays 0)
            def back(i2, carry):
                i = m - 1 - i2

                @pl.when(i < j)
                def _():
                    def inner(k, acc):
                        take = k > i
                        term = _df_mul(
                            (Rh_ref[i, k], Rl_ref[i, k]),
                            (yh_ref[k], yl_ref[k]),
                        )
                        return df_add(
                            acc,
                            (
                                jnp.where(take, term[0], 0.0),
                                jnp.where(take, term[1], 0.0),
                            ),
                        )

                    acc = _fori(
                        m,
                        inner,
                        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
                    )
                    s = df_sub((gh_ref[i], gl_ref[i]), acc)
                    rii = (Rh_ref[i, i], Rl_ref[i, i])
                    safe = jnp.abs(rii[0]) > 0.0
                    yi = _df_div(s, (jnp.where(safe, rii[0], 1.0), rii[1]))
                    yh_ref[i] = jnp.where(safe, yi[0], 0.0)
                    yl_ref[i] = jnp.where(safe, yi[1], 0.0)

                return carry

            _fori(m, back, 0)

            # x += sum_i y_i V_i (pairwise df tree, as in the projections)
            upd = _tree_reduce(
                [
                    _df_scale(
                        (Vh_ref[j2], Vl_ref[j2]), (yh_ref[j2], yl_ref[j2])
                    )
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
            xnew = df_add((oxh_ref[:], oxl_ref[:]), upd)
            oxh_ref[:] = xnew[0]
            oxl_ref[:] = xnew[1]
            return j

        def _done_now():
            """gmres_df's outer-loop exit tests, on the current state."""
            tol = (td_ref[0], td_ref[1])
            div = (td_ref[2], td_ref[3])
            rnorm = (rn_ref[0], rn_ref[1])
            rsum = rn_ref[0] + rn_ref[1]
            done = jnp.logical_not(_df_gt(rnorm, tol))
            done |= st_ref[0] >= max_it
            done |= _df_gt(rnorm, div)
            done |= jnp.logical_not(jnp.isfinite(rsum))
            return done

        init_done = _done_now()

        def cycle_cond(carry):
            return carry == 0

        def cycle_body(carry):
            j = one_cycle()
            done = _done_now() | (j == 0)
            return jnp.where(done, jnp.int32(1), jnp.int32(0))

        lax.while_loop(
            cycle_cond,
            cycle_body,
            jnp.where(init_done, jnp.int32(1), jnp.int32(0)),
        )

        oj_ref[0] = st_ref[1]
        oits_ref[0] = st_ref[0]
        orn_ref[0] = rn_ref[0]
        orn_ref[1] = rn_ref[1]
        tol_f = (td_ref[0], td_ref[1])
        conv = jnp.logical_not(_df_gt((rn_ref[0], rn_ref[1]), tol_f))
        oconv_ref[0] = jnp.where(conv, jnp.int32(1), jnp.int32(0))
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

    pc_inputs = tuple(ilu_consts) if n_pc_in else ()

    def solve_call(xh, xl, bh, bl, its, rtol2, atol2, dtol2, max_it):
        out_shape = (
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        )
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_specs = (vm, vm, sm, sm, sm, sm)
        if debug:
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((mS, Rp, Wp), jnp.float32),
                jax.ShapeDtypeStruct((mS, Rp, Wp), jnp.float32),
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
            in_specs=[vm] * (7 + n_pc_in) + [sm, sm, sm, sm, sm],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((mS, Rp, Wp), jnp.float32),
                pltpu.VMEM((mS, Rp, Wp), jnp.float32),
            ]
            + [pltpu.SMEM((nS,), jnp.float32)] * 12
            + [
                pltpu.SMEM((2,), jnp.float32),  # rn_ref
                pltpu.SMEM((2,), jnp.int32),  # st_ref (its, j)
                pltpu.SMEM((4,), jnp.float32),  # td_ref (tol, div)
                pltpu.SMEM((m1, m1), jnp.float32),
                pltpu.SMEM((m1, m1), jnp.float32),
            ],
            interpret=(jax.default_backend().lower() not in ("tpu", "axon")),
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if _HAS_PLTPU
                else None
            ),
        )(
            xh, xl, bh, bl, imask_a, bmask_a, fmask_a, *pc_inputs,
            jnp.reshape(its, (1,)).astype(jnp.int32),
            rtol2, atol2, dtol2,
            jnp.asarray([max_it], jnp.int32),
        )

    return solve_call, geo


def _build_cycle_ef64(op, m: int):
    """The knife-edge ef64 (f64-FAITHFUL) twin of ``_build_cycle``
    (pc none only).

    Identical restart/Givens/stopping structure; EVERY op — vector and
    SMEM scalar — is an f64-grade faithfully-rounded op on f32 triples
    (``_e_add``/``_e_mul``/``_e_div``/``_e_sqrt`` + ``_ef_round``).
    Measured rationale (docs/design.md §7): the knife-edge counts need
    f64's accuracy class EXACTLY — df32 (~49-bit) overshoots (2D N=8: 42,
    PETSc 40), tf32 (~71-bit) undershoots (38) because PETSc's own f64
    rounding delays convergence in the stagnation tail; f64-grade per-op
    rounding is necessary (``experiments/f64_structure_probe.py``). It is
    not quite sufficient: the 2D N=8 cell is a RAZOR EDGE that
    discriminates implementations WITHIN the f64 class (morph probes:
    legitimate f64 op orders land 39 or 40), so — exactly like the NGS
    parity coloring (``ops/ordering.ngs_parity_coloring``) — this kernel
    PINS the draw that agrees with PETSc at every served cell:
    ``matvec=diff`` (the native cross-field-difference order) + CGS2.
    Pinned counts (interpret mode, bit-faithful to Mosaic): 2D N=4 -> 10,
    2D N=8 -> 40, 3D nx=4 -> 27 — all PETSc-exact. Knobs
    ``PERPHIL_TPU_EF64_MATVEC`` / ``PERPHIL_TPU_EF64_CGS2`` reproduce the
    measured alternatives. Any edit to the Givens/back-substitution
    blocks here must mirror ``_build_cycle``'s (deliberate twin; the df
    kernel is the template).
    """
    ns = tuple(op.mesh.node_shape)
    geo = _geometry(
        op,
        group=_plane_group(ns),
        field_lanes=_use_field_lanes(ns),
    )
    Rp, Wp = geo.Rp, geo.Wp
    m1 = m + 1
    mS = _next_pow2(m1)
    nS = m1 + 1
    # CGS2 is part of the PINNED implementation draw (see the class
    # docstring): with single-pass CGS the razor-edge 2D N=8 cell lands
    # 39; the CGS2 draw lands PETSc's 40 while N=4 (10) and 3D nx=4 (27)
    # are draw-invariant. Also the fused-kernel family default
    # (PERPHIL_TPU_FUSED_CGS2).
    cgs2 = os.environ.get("PERPHIL_TPU_EF64_CGS2", "1") == "1"
    _matvec = build_packed_matvec_ef64(geo, op)

    def _basis_dots_e(V, w):
        """<V[i], w> for all basis rows -> (mS, 1, Wp) f64-grid triples
        (lane-replicated): per-element f64-grade products + f64-grade
        halving trees (rows, then a lane rotate+add butterfly)."""
        t = _e_mul(V, (w[0][None], w[1][None], w[2][None]))
        R = Rp
        while R > 1:
            half = R // 2
            t = _e_add(
                (t[0][:, :half], t[1][:, :half], t[2][:, :half]),
                (t[0][:, half:R], t[1][:, half:R], t[2][:, half:R]),
            )
            R = half
        sh_ = Wp // 2
        while sh_ >= 1:
            rolled = tuple(pltpu.roll(c, jnp.int32(sh_), 2) for c in t)
            t = _e_add(t, rolled)
            sh_ //= 2
        return t

    def _basis_comb_e(V, s):
        """sum_i s[i] * V[i] -> (Rp, Wp) triple (s lane-replicated
        triples), f64-grade per element and per tree level."""
        t = _e_mul(V, s)
        B = mS
        while B > 1:
            half = B // 2
            t = _e_add(
                (t[0][:half], t[1][:half], t[2][:half]),
                (t[0][half:B], t[1][half:B], t[2][half:B]),
            )
            B = half
        return t[0][0], t[1][0], t[2][0]

    def _tree_dot_e(u, v):
        """f64-grade dot of packed triples -> f64-grid triple scalar."""
        t = _e_mul(u, v)
        R = Rp
        while R > 1:
            half = R // 2
            t = _e_add(
                (t[0][:half], t[1][:half], t[2][:half]),
                (t[0][half:R], t[1][half:R], t[2][half:R]),
            )
            R = half
        C = Wp
        while C > 1:
            half = C // 2
            t = _e_add(
                (t[0][:, :half], t[1][:, :half], t[2][:, :half]),
                (t[0][:, half:C], t[1][:, half:C], t[2][:, half:C]),
            )
            C = half
        return t[0][0, 0], t[1][0, 0], t[2][0, 0]

    def kernel(*refs):
        (
            xh_ref, xm_ref, xl_ref, bh_ref, bm_ref, bl_ref,
            im_ref, bmk_ref, fm_ref,
        ) = refs[:9]
        (its_ref, rtol_ref, atol_ref, dtol_ref, maxit_ref) = refs[9:14]
        outs = refs[14:21]
        oxh_ref, oxm_ref, oxl_ref, oj_ref, oits_ref, orn_ref, oconv_ref = outs
        (Vh_ref, Vm_ref, Vl_ref,
         hh_ref, hm_ref, hl_ref,
         csh_ref, csm_ref, csl_ref,
         snh_ref, snm_ref, snl_ref,
         gh_ref, gm_ref, gl_ref,
         yh_ref, ym_ref, yl_ref,
         rn_ref, st_ref, td_ref,
         Rh_ref, Rm_ref, Rl_ref) = refs[21:]
        imask = im_ref[:]
        bmask = bmk_ref[:]
        fmask = fm_ref[:]
        b = (bh_ref[:], bm_ref[:], bl_ref[:])
        max_it = maxit_ref[0]

        oxh_ref[:] = xh_ref[:]
        oxm_ref[:] = xm_ref[:]
        oxl_ref[:] = xl_ref[:]

        def _x():
            return (oxh_ref[:], oxm_ref[:], oxl_ref[:])

        def _h(i):
            return (hh_ref[i], hm_ref[i], hl_ref[i])

        def _g(i):
            return (gh_ref[i], gm_ref[i], gl_ref[i])

        def _rn():
            return (rn_ref[0], rn_ref[1], rn_ref[2])

        def _tol():
            return (td_ref[0], td_ref[1], td_ref[2])

        def _div():
            return (td_ref[3], td_ref[4], td_ref[5])

        r0 = _e_sub(b, _matvec(_x(), imask, bmask, fmask))
        beta0 = _e_sqrt(_tree_dot_e(r0, r0))
        rtol_t = (rtol_ref[0], rtol_ref[1], rtol_ref[2])
        atol_t = (atol_ref[0], atol_ref[1], atol_ref[2])
        dtol_t = (dtol_ref[0], dtol_ref[1], dtol_ref[2])
        t_rel = _e_mul(rtol_t, beta0)
        use_rel = _e_gt(t_rel, atol_t)
        tol = tuple(
            jnp.where(use_rel, t_rel[k], atol_t[k]) for k in range(3)
        )
        div = _e_mul(dtol_t, beta0)
        for k in range(3):
            td_ref[k] = tol[k]
            td_ref[3 + k] = div[k]
            rn_ref[k] = beta0[k]
        st_ref[0] = its_ref[0]
        st_ref[1] = 0

        def one_cycle():
            r = _e_sub(b, _matvec(_x(), imask, bmask, fmask))
            beta = _e_sqrt(_tree_dot_e(r, r))
            nz = beta[0] > 0.0
            one = (
                jnp.ones((), jnp.float32),
                jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.float32),
            )
            inv = _e_div(one, beta)
            inv = tuple(
                jnp.where(nz, inv[k], one[k]) for k in range(3)
            )
            v0 = _e_mul(r, inv)

            Vh_ref[:] = jnp.zeros((mS, Rp, Wp), jnp.float32)
            Vm_ref[:] = jnp.zeros((mS, Rp, Wp), jnp.float32)
            Vl_ref[:] = jnp.zeros((mS, Rp, Wp), jnp.float32)
            Vh_ref[0] = v0[0]
            Vm_ref[0] = v0[1]
            Vl_ref[0] = v0[2]
            for i in range(nS):
                yh_ref[i] = 0.0
                ym_ref[i] = 0.0
                yl_ref[i] = 0.0

            def zero_R(i, carry):
                for k in range(m1):
                    Rh_ref[i, k] = 0.0
                    Rm_ref[i, k] = 0.0
                    Rl_ref[i, k] = 0.0
                return carry

            _fori(m1, zero_R, 0)
            gh_ref[0] = beta[0]
            gm_ref[0] = beta[1]
            gl_ref[0] = beta[2]
            for k in range(3):
                rn_ref[k] = beta[k]
            st_ref[1] = 0

            def body(j, _):
                rnorm = _rn()
                its = st_ref[0]
                ok = (st_ref[1] == j) & (its < max_it)
                ok &= _e_gt(rnorm, _tol())
                ok &= jnp.logical_not(_e_gt(rnorm, _div()))

                @pl.when(ok)
                def _():
                    vj = (Vh_ref[j], Vm_ref[j], Vl_ref[j])
                    w = _matvec(vj, imask, bmask, fmask)
                    V = (Vh_ref[:], Vm_ref[:], Vl_ref[:])
                    s = _basis_dots_e(V, w)  # (mS, 1, Wp) triples
                    w = _e_sub(w, _basis_comb_e(V, s))
                    if cgs2:
                        c2 = _basis_dots_e(V, w)
                        w = _e_sub(w, _basis_comb_e(V, c2))
                        s = _e_add(s, c2)
                    for j2 in range(m1):
                        hh_ref[j2] = s[0][j2, 0, 0]
                        hm_ref[j2] = s[1][j2, 0, 0]
                        hl_ref[j2] = s[2][j2, 0, 0]
                    hj1 = _e_sqrt(_tree_dot_e(w, w))
                    pos = hj1[0] > 0.0
                    one = (
                        jnp.ones((), jnp.float32),
                        jnp.zeros((), jnp.float32),
                        jnp.zeros((), jnp.float32),
                    )
                    invn = _e_div(one, hj1)
                    invn = tuple(
                        jnp.where(pos, invn[k], one[k]) for k in range(3)
                    )
                    wn = _e_mul(w, invn)
                    Vh_ref[j + 1] = wn[0]
                    Vm_ref[j + 1] = wn[1]
                    Vl_ref[j + 1] = wn[2]
                    hh_ref[j + 1] = hj1[0]
                    hm_ref[j + 1] = hj1[1]
                    hl_ref[j + 1] = hj1[2]

                    # stored Givens rotations 0..j-1 — structural twin of
                    # _build_cycle's chain, every op f64-faithful
                    def rot(i, carry):
                        @pl.when(i < j)
                        def _():
                            c = (csh_ref[i], csm_ref[i], csl_ref[i])
                            s_ = (snh_ref[i], snm_ref[i], snl_ref[i])
                            hi_ = _h(i)
                            hi1 = _h(i + 1)
                            t0 = _e_add(_e_mul(c, hi_), _e_mul(s_, hi1))
                            t1 = _e_sub(_e_mul(c, hi1), _e_mul(s_, hi_))
                            hh_ref[i] = t0[0]
                            hm_ref[i] = t0[1]
                            hl_ref[i] = t0[2]
                            hh_ref[i + 1] = t1[0]
                            hm_ref[i + 1] = t1[1]
                            hl_ref[i + 1] = t1[2]

                        return carry

                    _fori(m, rot, 0)

                    a_ = _h(j)
                    b_ = _h(j + 1)
                    den = _e_sqrt(
                        _e_add(_e_mul(a_, a_), _e_mul(b_, b_))
                    )
                    dpos = den[0] > 0.0
                    den_s = (
                        jnp.where(dpos, den[0], 1.0),
                        jnp.where(dpos, den[1], 0.0),
                        jnp.where(dpos, den[2], 0.0),
                    )
                    cn = _e_div(a_, den_s)
                    sn_ = _e_div(b_, den_s)
                    cn = (
                        jnp.where(dpos, cn[0], 1.0),
                        jnp.where(dpos, cn[1], 0.0),
                        jnp.where(dpos, cn[2], 0.0),
                    )
                    sn_ = (
                        jnp.where(dpos, sn_[0], 0.0),
                        jnp.where(dpos, sn_[1], 0.0),
                        jnp.where(dpos, sn_[2], 0.0),
                    )
                    csh_ref[j] = cn[0]
                    csm_ref[j] = cn[1]
                    csl_ref[j] = cn[2]
                    snh_ref[j] = sn_[0]
                    snm_ref[j] = sn_[1]
                    snl_ref[j] = sn_[2]
                    hjj = _e_add(_e_mul(cn, a_), _e_mul(sn_, b_))
                    hh_ref[j] = hjj[0]
                    hm_ref[j] = hjj[1]
                    hl_ref[j] = hjj[2]
                    hh_ref[j + 1] = 0.0
                    hm_ref[j + 1] = 0.0
                    hl_ref[j + 1] = 0.0

                    def copycol(i, carry):
                        Rh_ref[i, j] = hh_ref[i]
                        Rm_ref[i, j] = hm_ref[i]
                        Rl_ref[i, j] = hl_ref[i]
                        return carry

                    _fori(m, copycol, 0)

                    gj = _g(j)
                    t0 = _e_mul(cn, gj)
                    t1 = _e_mul(sn_, gj)
                    gh_ref[j] = t0[0]
                    gm_ref[j] = t0[1]
                    gl_ref[j] = t0[2]
                    gh_ref[j + 1] = -t1[0]
                    gm_ref[j + 1] = -t1[1]
                    gl_ref[j + 1] = -t1[2]
                    rnew = _e_abs(_g(j + 1))
                    rn_ref[0] = rnew[0]
                    rn_ref[1] = rnew[1]
                    rn_ref[2] = rnew[2]
                    st_ref[0] = its + 1
                    st_ref[1] = j + 1

                return _

            _fori(m, lambda j, c: (body(j, c), 0)[1], 0)
            j = st_ref[1]

            def back(i2, carry):
                i = m - 1 - i2

                @pl.when(i < j)
                def _():
                    def inner(k, acc):
                        take = k > i
                        term = _e_mul(
                            (Rh_ref[i, k], Rm_ref[i, k], Rl_ref[i, k]),
                            (yh_ref[k], ym_ref[k], yl_ref[k]),
                        )
                        masked = tuple(
                            jnp.where(take, term[t], 0.0) for t in range(3)
                        )
                        return _e_add(acc, masked)

                    z0 = jnp.zeros((), jnp.float32)
                    acc = _fori(m, inner, (z0, z0, z0))
                    s_ = _e_sub(_g(i), acc)
                    rii = (Rh_ref[i, i], Rm_ref[i, i], Rl_ref[i, i])
                    safe = jnp.abs(rii[0]) > 0.0
                    rii_s = (
                        jnp.where(safe, rii[0], 1.0),
                        jnp.where(safe, rii[1], 0.0),
                        jnp.where(safe, rii[2], 0.0),
                    )
                    yi = _e_div(s_, rii_s)
                    yh_ref[i] = jnp.where(safe, yi[0], 0.0)
                    ym_ref[i] = jnp.where(safe, yi[1], 0.0)
                    yl_ref[i] = jnp.where(safe, yi[2], 0.0)

                return carry

            _fori(m, back, 0)

            # x += sum_i y_i V_i (pairwise f64-grade tree)
            terms = [
                _e_mul(
                    (Vh_ref[j2], Vm_ref[j2], Vl_ref[j2]),
                    (yh_ref[j2], ym_ref[j2], yl_ref[j2]),
                )
                for j2 in range(m)
            ]
            while len(terms) > 1:
                nxt = []
                for i in range(0, len(terms) - 1, 2):
                    nxt.append(_e_add(terms[i], terms[i + 1]))
                if len(terms) % 2:
                    nxt.append(terms[-1])
                terms = nxt
            xnew = _e_add(_x(), terms[0])
            oxh_ref[:] = xnew[0]
            oxm_ref[:] = xnew[1]
            oxl_ref[:] = xnew[2]
            return j

        def _done_now():
            rnorm = _rn()
            rsum = rn_ref[0] + rn_ref[1]
            done = jnp.logical_not(_e_gt(rnorm, _tol()))
            done |= st_ref[0] >= max_it
            done |= _e_gt(rnorm, _div())
            done |= jnp.logical_not(jnp.isfinite(rsum))
            return done

        init_done = _done_now()

        def cycle_cond(carry):
            return carry == 0

        def cycle_body(carry):
            j = one_cycle()
            done = _done_now() | (j == 0)
            return jnp.where(done, jnp.int32(1), jnp.int32(0))

        lax.while_loop(
            cycle_cond,
            cycle_body,
            jnp.where(init_done, jnp.int32(1), jnp.int32(0)),
        )

        oj_ref[0] = st_ref[1]
        oits_ref[0] = st_ref[0]
        orn_ref[0] = rn_ref[0]
        orn_ref[1] = rn_ref[1]
        orn_ref[2] = rn_ref[2]
        conv = jnp.logical_not(_e_gt(_rn(), _tol()))
        oconv_ref[0] = jnp.where(conv, jnp.int32(1), jnp.int32(0))

    imask_a = jnp.asarray(geo.imask)
    bmask_a = jnp.asarray(geo.bmask)
    fmask_a = jnp.asarray(geo.fmask)

    def solve_call(xh, xm, xl, bh, bm, bl, its, rtol3, atol3, dtol3, max_it):
        out_shape = (
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((3,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        )
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[vm] * 9 + [sm] * 5,
            out_specs=(vm, vm, vm, sm, sm, sm, sm),
            scratch_shapes=[
                pltpu.VMEM((mS, Rp, Wp), jnp.float32),
                pltpu.VMEM((mS, Rp, Wp), jnp.float32),
                pltpu.VMEM((mS, Rp, Wp), jnp.float32),
            ]
            + [pltpu.SMEM((nS,), jnp.float32)] * 15
            + [
                pltpu.SMEM((3,), jnp.float32),  # rn_ref
                pltpu.SMEM((2,), jnp.int32),  # st_ref (its, j)
                pltpu.SMEM((6,), jnp.float32),  # td_ref (tol, div triples)
                pltpu.SMEM((m1, m1), jnp.float32),
                pltpu.SMEM((m1, m1), jnp.float32),
                pltpu.SMEM((m1, m1), jnp.float32),
            ],
            interpret=(jax.default_backend().lower() not in ("tpu", "axon")),
            compiler_params=(
                pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
                if _HAS_PLTPU
                else None
            ),
        )(
            xh, xm, xl, bh, bm, bl, imask_a, bmask_a, fmask_a,
            jnp.reshape(its, (1,)).astype(jnp.int32),
            rtol3, atol3, dtol3,
            jnp.asarray([max_it], jnp.int32),
        )

    return solve_call, geo


def _split_f64_3(s):
    """f64 scalar -> (3,) f32 words summing EXACTLY to it."""
    s = jnp.asarray(s)
    hi = s.astype(jnp.float32)
    r = s - hi.astype(s.dtype)
    mid = r.astype(jnp.float32)
    lo = (r - mid.astype(s.dtype)).astype(jnp.float32)
    return jnp.stack([hi, mid, lo])


def fused_gmres_ef64(
    op,
    b_tf,
    x0_tf,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 10000,
    restart: int = 30,
    dtol: float = DEFAULT_DTOL,
) -> KrylovResult:
    """Whole-solve fused GMRES in ef64 (f64-FAITHFUL f32-triple
    arithmetic) — the on-chip knife-edge parity mode.
    ``ops/krylov.gmres_ef64`` is its XLA twin (true f64 on CPU); Mosaic
    has no f64 and the axon XLA loop path carries ~1e-7 in-loop noise, so
    faithful emulation in-kernel is the only deterministic route to
    PETSc-exact counts on the chip. Inputs are stacked-(2, *grid) f32
    triples summing exactly to the f64 inputs (``tf32.tf_from_f64``).
    Unpreconditioned only."""
    solve_call, geo = _build_cycle_ef64(op, int(restart))

    packed = [geo.pack(c) for c in x0_tf] + [geo.pack(c) for c in b_tf]
    rtol3 = _split_f64_3(jnp.asarray(rtol, jnp.float64))
    atol3 = _split_f64_3(jnp.asarray(atol, jnp.float64))
    dtol3 = _split_f64_3(jnp.asarray(dtol, jnp.float64))

    xh2, xm2, xl2, j, its, rn, conv = solve_call(
        *packed, jnp.asarray(0, jnp.int32), rtol3, atol3, dtol3, max_it
    )
    rnorm = (
        rn[0].astype(jnp.float64)
        + rn[1].astype(jnp.float64)
        + rn[2].astype(jnp.float64)
    )
    x = (geo.unpack(xh2), geo.unpack(xm2), geo.unpack(xl2))
    return KrylovResult(x, its[0], rnorm, conv[0] == 1)


def _split_f64(s):
    """f64 scalar -> (2,) f32 (hi, lo) pair array."""
    s = jnp.asarray(s)
    hi = s.astype(jnp.float32)
    lo = (s - hi.astype(s.dtype)).astype(jnp.float32)
    return jnp.stack([hi, lo])


def fused_gmres_df(
    op,
    b_df,
    x0_df,
    rtol: float = 1.0e-5,
    atol: float = 1.0e-50,
    max_it: int = 10000,
    restart: int = 30,
    dtol: float = DEFAULT_DTOL,
    pc_type: str = "none",
) -> KrylovResult:
    """Drop-in replacement for unpreconditioned
    ``gmres_df(op.stacked_matvec_df(), ...)`` running the ENTIRE solve —
    restart loop included — as one Pallas kernel. Same stopping semantics
    as ``ops/krylov.gmres_df`` (reference KSP defaults:
    ``/root/reference/src/perphil/solvers/parameters.py:12-21``), with
    rnorm0/tol/div computed in-kernel in double-float (~49-bit) instead of
    f64. One kernel per solve because on this backend EVERY XLA-level loop
    step costs ~0.6-7 ms of sequencing overhead while in-kernel loop
    iterations are nearly free (measured: an empty 30-iteration in-kernel
    body times identically to the full GMRES body)."""
    solve_call, geo = _build_cycle(op, int(restart), pc_type=pc_type)

    xh = geo.pack(x0_df[0])
    xl = geo.pack(x0_df[1])
    bh = geo.pack(b_df[0])
    bl = geo.pack(b_df[1])

    rtol2 = _split_f64(jnp.asarray(rtol, jnp.float64))
    atol2 = _split_f64(jnp.asarray(atol, jnp.float64))
    dtol2 = _split_f64(jnp.asarray(dtol, jnp.float64))

    xh2, xl2, j, its, rn, conv = solve_call(
        xh, xl, bh, bl, jnp.asarray(0, jnp.int32), rtol2, atol2, dtol2, max_it
    )[:6]
    rnorm = rn[0].astype(jnp.float64) + rn[1].astype(jnp.float64)
    x = (geo.unpack(xh2), geo.unpack(xl2))
    return KrylovResult(x, its[0], rnorm, conv[0] == 1)
