"""Fused Pallas stencil-kernel tests (interpret mode on CPU; the compiled
path is exercised on TPU by bench/production runs)."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.pallas_kernels import _Element, fused_dpp_apply
from perphil_tpu.ops.stencil import apply_stencil, compile_stencils

pytestmark = pytest.mark.skipif(_Element is None, reason="no Pallas Element indexing")


@pytest.mark.parametrize(
    "mesh",
    [create_mesh(13, 9), create_mesh(32, 32),
     create_cube_mesh(7, 6, 5, hexahedral=True),
     create_cube_mesh(16, 16, 16, hexahedral=True)],
    ids=["2d-ragged", "2d-32", "3d-ragged", "3d-16"],
)
def test_fused_apply_matches_stencils(mesh):
    K_st, M_st = compile_stencils(mesh)
    p = DPPParameters()
    S1 = np.asarray((p.k1 / p.mu) * K_st + (p.beta / p.mu) * M_st)
    S2 = np.asarray((p.k2 / p.mu) * K_st + (p.beta / p.mu) * M_st)
    C = np.asarray(-(p.beta / p.mu) * M_st)
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal(mesh.node_shape), dtype=jnp.float32)
    z2 = jnp.asarray(rng.standard_normal(mesh.node_shape), dtype=jnp.float32)
    y1, y2 = fused_dpp_apply(z1, z2, S1, S2, C, interpret=True)
    r1 = apply_stencil(z1, S1) + apply_stencil(z2, C)
    r2 = apply_stencil(z1, C) + apply_stencil(z2, S2)
    scale = float(jnp.abs(r1).max()) + 1.0
    assert float(jnp.abs(y1 - r1).max()) / scale < 1e-5
    assert float(jnp.abs(y2 - r2).max()) / scale < 1e-5
