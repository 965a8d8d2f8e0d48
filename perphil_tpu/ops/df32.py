"""Double-float (two-float32) arithmetic for f64-quality compute on TPU.

TPU v5e has no native float64: XLA emulates it in software at a 30-100x
slowdown (measured here: the 27-point DPP matvec at 128^3 runs at ~10 GB/s
effective in emulated f64 vs ~700 GB/s peak). The classic fix — anticipated
by SURVEY.md §7's "hard parts" ("double-word arithmetic … on TPU") — is
double-float arithmetic: a value is an unevaluated sum ``hi + lo`` of two
float32s (~49-bit mantissa, unit roundoff ~6e-15), with error-free
transformations (Knuth two-sum, Dekker split / two-product) implemented in
fast native f32 VPU ops.

Used by the mixed-precision direct solver (``ops/mixed.py``): f32 MXU
fast-diagonalization + double-float residuals inside iterative refinement
reach float64-level accuracy at float32 speed.

All functions operate elementwise on (hi, lo) array pairs and are
jit/shard-transparent.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

DF = Tuple[jnp.ndarray, jnp.ndarray]

_SPLITTER = jnp.float32(4097.0)  # 2^12 + 1 (f32 has 24-bit mantissa)


def two_sum(a, b) -> DF:
    """Error-free a + b = s + e (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b) -> DF:
    """Error-free a + b = s + e assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a) -> DF:
    """Dekker split: a = hi + lo with hi, lo having 12-bit mantissas."""
    t = _SPLITTER * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> DF:
    """Error-free a * b = p + e (Dekker two-product, no FMA assumed)."""
    p = a * b
    a_hi, a_lo = split(a)
    b_hi, b_lo = split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def df_from_f64(x64) -> DF:
    """Split a float64 array into a double-float pair (IO boundary only)."""
    x64 = jnp.asarray(x64, dtype=jnp.float64)
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def df_to_f64(x: DF):
    """Recombine into float64 (host-side verification only)."""
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def df_add(x: DF, y: DF) -> DF:
    """Double-float addition (Dekker/Knuth, ~11 flops)."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return fast_two_sum(s, e)


def df_neg(x: DF) -> DF:
    return -x[0], -x[1]


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_scale_f32(x: DF, w) -> DF:
    """Double-float times exact-ish f32 scalar/array w."""
    p, e = two_prod(x[0], w)
    e = e + x[1] * w
    return fast_two_sum(p, e)


def df_mul(x: DF, y: DF) -> DF:
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return fast_two_sum(p, e)


def df_axpy_wf64(acc: DF, w64: float, v: DF) -> DF:
    """acc += w * v with w given in f64 (split into a df constant)."""
    w_hi = np.float32(w64)
    w_lo = np.float32(w64 - float(w_hi))
    term = df_scale_f32(v, w_hi)
    if float(w_lo) != 0.0:
        # skip the correction entirely for f32-exact weights (common for
        # stencil constants like -1/4): it is a trace-time constant-zero
        # that would still cost a df_scale + df_add per grid point
        term = df_add(term, df_scale_f32(v, w_lo))
    return df_add(acc, term)


# ---------------------------------------------------------------------------
# double-float stencil application (the accurate residual matvec)
# ---------------------------------------------------------------------------


def df_apply_stencil(x: DF, stencil: np.ndarray) -> DF:
    """Apply a constant 3^d stencil (float64 weights) to a double-float grid,
    keeping ~49-bit accuracy — the fast replacement for the emulated-f64
    stencil matvec in residual computations."""
    d = x[0].ndim
    hi = jnp.pad(x[0], 1)
    lo = jnp.pad(x[1], 1)
    shape = x[0].shape
    acc = (jnp.zeros(shape, dtype=jnp.float32), jnp.zeros(shape, dtype=jnp.float32))
    for idx in itertools.product(range(3), repeat=d):
        w = float(stencil[idx])
        if w == 0.0:
            continue
        slices = tuple(slice(k, k + s) for k, s in zip(idx, shape))
        acc = df_axpy_wf64(acc, w, (hi[slices], lo[slices]))
    return acc
