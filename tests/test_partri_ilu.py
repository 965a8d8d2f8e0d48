"""Parallel-prefix ILU/GS application equals the wavefront reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from perphil_tpu.mesh.structured import StructuredMesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops import ilu as ilu_mod
from perphil_tpu.ops.ilu import (
    GaussSeidelSweeper,
    PartriGS,
    PartriILU,
    StructuredILU0,
    build_field_system,
    build_monolithic_system,
    ilu0_factorize,
    _padded_levels,
    _wavefront_unroll,
)

# slow: scan-tree ILU applications (heavy on CPU); run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow


def _mesh(dim, n, simplex):
    if dim == 2:
        element = "triangle" if simplex else "quad"
        return StructuredMesh(cells=(n, n), element=element)
    element = "tet" if simplex else "hex"
    return StructuredMesh(cells=(n, n, n), element=element)


def _wavefront_ilu(sys, dtype):
    f = ilu0_factorize(sys)
    return StructuredILU0(
        mesh=sys.mesh,
        nfields=sys.nfields,
        factors=jnp.asarray(f, dtype=dtype),
        deltas=tuple(int(x) for x in sys.deltas),
        center=sys.center_index,
        levels=jnp.asarray(_padded_levels(sys, _wavefront_unroll())),
        partri=None,
    )


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("simplex", [False, True])
@pytest.mark.parametrize("monolithic", [True, False])
def test_partri_ilu_matches_wavefront(dim, simplex, monolithic):
    n = 6 if dim == 2 else 4
    mesh = _mesh(dim, n, simplex)
    params = DPPParameters()
    if monolithic:
        sys = build_monolithic_system(mesh, params)
    else:
        sys = build_field_system(mesh, params.k1, params.beta, params.mu)
    dtype = jnp.float64
    wave = _wavefront_ilu(sys, dtype)
    part = PartriILU(sys, ilu0_factorize(sys), dtype)

    rng = np.random.default_rng(dim * 10 + simplex)
    r = jnp.asarray(rng.standard_normal(sys.nrows), dtype=dtype)
    z_wave = np.asarray(wave.apply_flat(r))
    z_part = np.asarray(part.apply_flat(r))
    np.testing.assert_allclose(z_part, z_wave, rtol=5e-12, atol=5e-12)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("simplex", [False, True])
def test_partri_gs_matches_wavefront(dim, simplex):
    n = 6 if dim == 2 else 4
    mesh = _mesh(dim, n, simplex)
    params = DPPParameters()
    sweeper = GaussSeidelSweeper.for_monolithic(mesh, params)
    assert sweeper.partri is not None
    sys = build_monolithic_system(mesh, params)
    wave = GaussSeidelSweeper(
        mesh=mesh,
        nfields=2,
        vals=sweeper.vals,
        deltas=tuple(int(x) for x in sys.deltas),
        center=sys.center_index,
        levels=jnp.asarray(_padded_levels(sys, _wavefront_unroll())),
        partri=None,
    )
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal(sys.nrows))
    b = jnp.asarray(rng.standard_normal(sys.nrows))
    np.testing.assert_allclose(
        np.asarray(sweeper.sweep(x, b)),
        np.asarray(wave.sweep(x, b)),
        rtol=5e-12,
        atol=5e-12,
    )


def test_default_backend_is_partri(monkeypatch):
    mesh = _mesh(2, 4, False)
    params = DPPParameters()
    sys = build_monolithic_system(mesh, params)
    ilu = StructuredILU0._from_system(sys)
    assert ilu.partri is not None
    monkeypatch.setenv("PERPHIL_TPU_TRISOLVE", "wavefront")
    ilu2 = StructuredILU0._from_system(sys)
    assert ilu2.partri is None


def test_partri_memory_guard(monkeypatch):
    mesh = _mesh(2, 4, False)
    params = DPPParameters()
    sys = build_monolithic_system(mesh, params)
    monkeypatch.setattr(ilu_mod, "_PARTRI_MAX_BYTES", 16)
    ilu = StructuredILU0._from_system(sys)
    assert ilu.partri is None
