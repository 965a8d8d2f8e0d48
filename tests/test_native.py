"""Native C++ runtime component tests: the ILU(0) factorization kernel must
agree with the numpy fallback to roundoff (both paths stay supported)."""

import numpy as np
import pytest

from perphil_tpu import _native
from perphil_tpu.mesh import create_mesh
from perphil_tpu.models.dpp import DPPParameters
from perphil_tpu.ops.ilu import (
    _factorization_tables,
    _ilu0_factorize_numpy,
    build_field_system,
    build_monolithic_system,
    ilu0_factorize,
)


def test_native_loads_or_degrades():
    lib = _native.load()
    # On the build machines g++ exists; elsewhere fallback must still work
    assert lib is not None or ilu0_factorize is not None


@pytest.mark.parametrize("builder", ["monolithic", "field"])
def test_native_matches_numpy(builder):
    if _native.load() is None:
        pytest.skip("no native toolchain")
    mesh = create_mesh(6, 5)
    params = DPPParameters()
    if builder == "monolithic":
        sysm = build_monolithic_system(mesh, params)
    else:
        sysm = build_field_system(mesh, params.k1, params.beta, params.mu)
    F_any = ilu0_factorize(sysm)  # dispatches to native when available
    F_np = _ilu0_factorize_numpy(sysm, *_factorization_tables(sysm))
    assert np.abs(F_any - F_np).max() < 1e-14
