"""Pallas TPU kernels for the hot stencil operations.

The monolithic DPP matvec is three stencil applications (K z1, K z2,
M (z1 - z2)) plus elementwise combination — in XLA, a chain of shifted adds
that may materialize intermediates. The fused Pallas kernel makes it one
VMEM pass: each grid program loads (z1, z2) tiles with a 1-halo once
(overlapping blocks via element-indexed BlockSpecs) and accumulates all
3^d offsets x both output fields in VMEM:

    y1 = S1 * z1 + C * z2,   y2 = C * z1 + S2 * z2
    (S_i = (k_i/mu) K + (beta/mu) M stencils, C = -(beta/mu) M)

float32 only (Mosaic has no f64); the f64 parity path keeps the XLA
shifted-add implementation. Boundary masking stays outside the kernel
(cheap elementwise, XLA fuses it with the pad).
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # Element-indexed (overlapping halo) blocks; private path differs by version
    from jax.experimental.pallas import Element as _Element  # type: ignore
except ImportError:  # pragma: no cover
    try:
        from jax._src.pallas.core import Element as _Element  # type: ignore
    except ImportError:
        _Element = None


def _offsets(d: int):
    return list(itertools.product(range(3), repeat=d))


def _make_kernel(d: int, S1: np.ndarray, S2: np.ndarray, C: np.ndarray, tile: Tuple[int, ...]):
    offs = _offsets(d)

    def kernel(z1_ref, z2_ref, y1_ref, y2_ref):
        acc1 = jnp.zeros(tile, dtype=jnp.float32)
        acc2 = jnp.zeros(tile, dtype=jnp.float32)
        for off in offs:
            w1 = float(S1[off])
            w2 = float(S2[off])
            wc = float(C[off])
            if w1 == 0.0 and w2 == 0.0 and wc == 0.0:
                continue
            sl = tuple(slice(o, o + t) for o, t in zip(off, tile))
            a = z1_ref[sl]
            b = z2_ref[sl]
            if w1 != 0.0:
                acc1 = acc1 + w1 * a
            if wc != 0.0:
                acc1 = acc1 + wc * b
                acc2 = acc2 + wc * a
            if w2 != 0.0:
                acc2 = acc2 + w2 * b
        y1_ref[...] = acc1
        y2_ref[...] = acc2

    return kernel


def _tile_for(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Output tile: full innermost (lane) axis; the second-to-last axis is
    tiled in multiples of 8 (Mosaic sublane constraint); outermost modest."""
    d = len(shape)
    if d == 2:
        return (min(_ceil_to(shape[0], 8), 128), shape[1])
    # ty capped at 32: larger halo'd overlapping blocks fail Mosaic
    # legalization at ragged lane sizes (empirical, jax 0.9/v5e)
    return (min(shape[0], 8), min(_ceil_to(shape[1], 8), 32), shape[2])


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_dpp_apply(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    S1: np.ndarray,
    S2: np.ndarray,
    C: np.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Raw fused stencil application (no BC masking) on f32 grids.

    Equivalent to ``apply_stencil(z1,S1) + apply_stencil(z2,C)`` and
    ``apply_stencil(z1,C) + apply_stencil(z2,S2)`` in one memory pass.
    """
    if _Element is None:
        raise RuntimeError("This JAX version lacks Pallas Element indexing")
    assert z1.dtype == jnp.float32 and z2.dtype == jnp.float32
    d = z1.ndim
    shape = z1.shape
    tile = _tile_for(shape)
    padded = tuple(_ceil_to(s, t) for s, t in zip(shape, tile))
    # grid over the outer (tiled) axes; the innermost lane axis is untiled
    grid = tuple(p // t for p, t in zip(padded[:-1], tile[:-1]))
    # Input halo blocks must satisfy Mosaic's sublane constraint (the
    # second-to-last block dim divisible by 8): oversize that halo to +8
    # and pad the input array accordingly. The lane (last) axis stays
    # full-size. Other axes use the exact +2 halo.
    halo = [2] * d
    halo[-2] = 8
    pads = [
        (1, p - s + 1 + (h - 2)) for s, p, h in zip(shape, padded, halo)
    ]
    z1p = jnp.pad(z1, pads)
    z2p = jnp.pad(z2, pads)

    in_block = tuple(
        _Element(t + h) if ax != d - 1 else _Element(z1p.shape[-1])
        for ax, (t, h) in enumerate(zip(tile, halo))
    )

    # index maps MUST return int32: under jax_enable_x64 the default is
    # int64, which Mosaic fails to legalize ("failed to legalize func.return")
    i32 = jnp.int32
    if d == 2:
        in_map = lambda i: (i32(i * tile[0]), i32(0))
        out_map = lambda i: (i32(i), i32(0))
    else:
        in_map = lambda i, j: (i32(i * tile[0]), i32(j * tile[1]), i32(0))
        out_map = lambda i, j: (i32(i), i32(j), i32(0))

    kernel = _make_kernel(d, S1, S2, C, tile)
    out_shape = [
        jax.ShapeDtypeStruct(padded, jnp.float32),
        jax.ShapeDtypeStruct(padded, jnp.float32),
    ]
    y1p, y2p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(in_block, in_map), pl.BlockSpec(in_block, in_map)],
        out_specs=[pl.BlockSpec(tile, out_map), pl.BlockSpec(tile, out_map)],
        out_shape=out_shape,
        interpret=interpret,
    )(z1p, z2p)
    crop = tuple(slice(0, s) for s in shape)
    return y1p[crop], y2p[crop]


def pallas_available() -> bool:
    """Pallas TPU lowering available on the current default backend?"""
    try:
        return _Element is not None and jax.devices()[0].platform.lower() in (
            "tpu",
            "axon",
        )
    except Exception:
        return False
