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


def test_csr_kernels_match_numpy_reference():
    """csr_ilu0_factorize + csr_gmres_ilu (csrc/csr_solver.cpp) must agree
    with the pure-numpy host reference (ops/ordering.py) on factors,
    iteration count, and solution."""
    if _native.load() is None:
        pytest.skip("no native toolchain")
    from perphil_tpu.ops import ordering as od

    mesh = create_mesh(5, 4)
    params = DPPParameters()
    sysm = build_monolithic_system(mesh, params)
    A = od.to_csr(sysm)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.shape[0])

    F, diag = od.host_ilu0(A)
    its_np, x_np, rnorm_np = od.host_gmres(
        lambda v: A @ v, b, lambda v: od.host_ilu_apply(F, diag, v),
        return_solution=True,
    )
    res = od.native_ilu_gmres(A, b)
    assert res is not None
    its_c, x_c, rnorm_c, _ = res
    assert its_c == its_np
    assert np.abs(x_c - x_np).max() / np.abs(x_np).max() < 1e-10
    assert abs(rnorm_c - rnorm_np) <= 1e-9 * max(rnorm_np, 1e-30)


def test_csr_gmres_history_matches_final_norm():
    if _native.load() is None:
        pytest.skip("no native toolchain")
    from perphil_tpu.ops import ordering as od

    mesh = create_mesh(4, 4)
    params = DPPParameters()
    A = od.to_csr(build_monolithic_system(mesh, params))
    b = np.linspace(1.0, 2.0, A.shape[0])
    its, x, rnorm, hist = od.native_ilu_gmres(A, b, with_history=True)
    assert hist is not None and len(hist) == its + 1
    assert hist[-1] == pytest.approx(rnorm)
    assert (np.diff(np.log(hist)) < 0).mean() > 0.8  # essentially monotone


def test_csr_gs_sweeps_matches_python():
    """csr_gs_sweeps (csrc/csr_solver.cpp) must return the identical sweep
    count as ops/ordering.py::host_gs_sweeps' pure-Python loop (same
    SNESConvergedDefault stopping, same sweep order)."""
    if _native.load() is None:
        pytest.skip("no native toolchain")
    from perphil_tpu.ops import ordering as od

    mesh = create_mesh(5, 4)
    params = DPPParameters()
    sysm = build_monolithic_system(mesh, params)
    A = od.to_csr(sysm).tocsr()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    x0 = np.zeros(A.shape[0])

    its_native = od.host_gs_sweeps(A, b, x0.copy())

    saved = (_native._lib, _native._tried)
    try:
        _native._lib, _native._tried = None, True  # force the Python path
        its_py = od.host_gs_sweeps(A, b, x0.copy())
    finally:
        _native._lib, _native._tried = saved
    assert its_native == its_py
