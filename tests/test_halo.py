"""Explicit shard_map halo-exchange matvec must match the single-device
operator exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from perphil_tpu.forms import create_function_spaces, mixed_space
from perphil_tpu.mesh import create_cube_mesh, create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.assembly import DPPOperator
from perphil_tpu.parallel.halo import shard_map_stacked_matvec
from perphil_tpu.parallel.sharding import device_mesh

# slow: explicit-halo benchmark and multi-axis exchanges; run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow


needs_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@needs_8
@pytest.mark.parametrize("dim", [2, 3])
def test_halo_matvec_matches_single_device(dim):
    if dim == 2:
        mesh = create_mesh(15, 15)
        dm = device_mesh([4], axis_names=("y",))
    else:
        mesh = create_cube_mesh(7, 7, 7, hexahedral=True)
        dm = device_mesh([4], axis_names=("z",))
    W = mixed_space(create_function_spaces(mesh)[1])
    op = DPPOperator(W, DPPParameters())
    mv_ref = jax.jit(op.stacked_matvec())
    mv_halo = shard_map_stacked_matvec(op, dm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2,) + mesh.node_shape))
    y_ref = np.asarray(mv_ref(x))
    y_halo = np.asarray(mv_halo(x))
    assert np.abs(y_halo - y_ref).max() < 1e-13 * (np.abs(y_ref).max() + 1)


@needs_8
@pytest.mark.parametrize(
    "dim,axes,names",
    [
        (2, [4, 2], ("y", "x")),
        (3, [4, 2], ("z", "y")),
        (3, [2, 2, 2], ("z", "y", "x")),
    ],
)
def test_halo_matvec_multi_axis(dim, axes, names):
    """Pencil/block decompositions: corner halos arrive via the
    dimension-by-dimension exchange."""
    if dim == 2:
        mesh = create_mesh(15, 15)
    else:
        mesh = create_cube_mesh(7, 7, 7, hexahedral=True)
    dm = device_mesh(axes, axis_names=names)
    W = mixed_space(create_function_spaces(mesh)[1])
    op = DPPOperator(W, DPPParameters())
    mv_ref = jax.jit(op.stacked_matvec())
    mv_halo = shard_map_stacked_matvec(op, dm)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2,) + mesh.node_shape))
    y_ref = np.asarray(mv_ref(x))
    y_halo = np.asarray(mv_halo(x))
    assert np.abs(y_halo - y_ref).max() < 1e-13 * (np.abs(y_ref).max() + 1)


@needs_8
def test_benchmark_vs_gspmd_runs_and_agrees():
    from perphil_tpu.parallel.halo import benchmark_vs_gspmd

    mesh = create_cube_mesh(7, 7, 7, hexahedral=True)
    W = mixed_space(create_function_spaces(mesh)[1])
    op = DPPOperator(W, DPPParameters())
    dm = device_mesh([4, 2], axis_names=("z", "y"))
    res = benchmark_vs_gspmd(op, dm, reps=3)
    assert res["max_abs_diff"] < 1e-10
    assert res["explicit_halo_s"] > 0 and res["gspmd_s"] > 0
