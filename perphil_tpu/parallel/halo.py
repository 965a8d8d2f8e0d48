"""Explicit halo-exchange stencil application via shard_map + ppermute.

``parallel.sharding`` relies on XLA's SPMD partitioner to derive halo
exchanges automatically from the shifted-slice stencils — the recommended
default. This module provides the *explicit* formulation: fields live as
per-device slabs inside ``jax.shard_map``, neighbor planes move over ICI
with ``jax.lax.ppermute``, and the stencil is applied locally. Useful when
manual control over communication (overlap, scheduling, Pallas remote-DMA
kernels later) beats the partitioner's choices, and as the direct analogue
of PETSc's VecScatter ghost updates (SURVEY §2.2).

Currently supports sharding along the outermost grid axis (z in 3D, y in
2D) — the natural slab decomposition for stencils (contiguous planes,
minimal surface).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perphil_tpu.ops.assembly import DPPOperator
from perphil_tpu.ops.stencil import apply_stencil


def shard_map_stacked_matvec(op: DPPOperator, dmesh: Mesh) -> Callable:
    """Build the BC-eliminated monolithic matvec on stacked fields
    (2, *grid) with explicit slab halo exchange along the first device-mesh
    axis. Result equals ``op.stacked_matvec()`` bit-for-bit (up to float
    reassociation)."""
    if len(dmesh.axis_names) != 1:
        raise ValueError("Explicit halo path currently shards one axis (slabs)")
    axis = dmesh.axis_names[0]
    n_shards = dmesh.devices.shape[0]
    K_st, M_st = op._stencils
    p = op.params
    bdry, interior = op._mask_arrays  # numpy grids (padded shape)
    gshape = op.grid_shape
    if gshape[0] % n_shards:
        raise ValueError(
            f"Outermost grid axis {gshape[0]} not divisible by {n_shards} shards"
        )

    bdry_j = jnp.asarray(bdry)
    spec_x = P(None, axis, *([None] * (len(gshape) - 1)))
    spec_m = P(axis, *([None] * (len(gshape) - 1)))

    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    @partial(
        jax.shard_map,
        mesh=dmesh,
        in_specs=(spec_x, spec_m),
        out_specs=spec_x,
    )
    def mv(x_local, bdry_local):
        # mask interior before the exchange (boundary columns are zeroed in
        # the eliminated operator, so halos of masked values are correct)
        zi = jnp.where(bdry_local[None], 0.0, x_local)
        # neighbor planes over ICI; edge shards receive zeros (exactly the
        # zero-Dirichlet-column semantics)
        up = jax.lax.ppermute(zi[:, -1:], axis, fwd)   # to next shard
        dn = jax.lax.ppermute(zi[:, :1], axis, bwd)    # to previous shard
        ze = jnp.concatenate([up, zi, dn], axis=1)

        def stencil_local(u, st):
            # apply on the extended slab, keep the local rows
            return apply_stencil(u, st)[1:-1]

        k1, k2, beta, mu = p.k1, p.k2, p.beta, p.mu
        Kz1 = stencil_local(ze[0], K_st)
        Kz2 = stencil_local(ze[1], K_st)
        Md = stencil_local(ze[0] - ze[1], M_st)
        y1 = (k1 / mu) * Kz1 + (beta / mu) * Md
        y2 = (k2 / mu) * Kz2 - (beta / mu) * Md
        y = jnp.stack([y1, y2])
        return jnp.where(bdry_local[None], x_local, y)

    def apply(x):
        xs = jax.device_put(x, NamedSharding(dmesh, spec_x))
        ms = jax.device_put(bdry_j, NamedSharding(dmesh, spec_m))
        return mv(xs, ms)

    return apply
