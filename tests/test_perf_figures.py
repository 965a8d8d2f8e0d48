"""Figure-library smoke tests: every family renders from a synthetic
profiling frame, per-solve normalization honors the metadata repeats, and
the wall partition sums exactly to time_total."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).parents[1] / "notebooks"))
import _perf_figures as pf  # noqa: E402


def _synthetic(nxs=(4, 8), approaches=("GMRES", "GMRES + ILU PC")):
    rng = np.random.default_rng(0)
    rows = []
    for nx in nxs:
        for ap in approaches:
            tot = float(rng.uniform(0.01, 0.1))
            rows.append({
                "approach": ap, "nx": nx, "ny": nx,
                "dofs": 2 * (nx + 1) ** 2, "num_cells": nx * nx,
                "iterations": int(rng.integers(4, 50)),
                "residual": 1e-9,
                "metadata": "{'repeats': 5, 'backend': 'events'}",
                "time_total": tot,
                "time_total_repeats": 5 * tot,
                "time_KSPSolve": 5 * tot,
                "time_PCSetUp": 30.0,  # one-time setup >> per-solve wall
                "time_PCApply": 2 * tot,
                "time_MatMult": 8 * tot,  # probe-extrapolated, > wall
                "time_SNESSolve": 5 * tot,
                "time_SNESFunctionEval": 0.0,
                "time_SNESJacobianEval": 0.0,
                "time_MatAssemblyBegin": 0.0,
                "time_MatAssemblyEnd": 0.0,
                "flops_total": 1e6,
                "mem_rss_peak_kb": 1e5,
                "mem_device_peak_bytes": 0,
            })
    return pd.DataFrame(rows)


def test_normalize_per_solve_uses_metadata_repeats():
    df = pf.normalize_per_solve(_synthetic())
    # repeat-window columns divided by 5; time_total and PCSetUp untouched
    assert np.allclose(df.time_KSPSolve, df.time_total)
    assert (df.time_PCSetUp == 30.0).all()


def test_wall_partition_sums_to_total():
    df = pf.normalize_per_solve(_synthetic())
    dft = df[df.nx == 8]
    parts = pf._partition_wall(dft)
    np.testing.assert_allclose(
        parts.sum(axis=1).to_numpy(), dft.time_total.to_numpy(), rtol=1e-12
    )


def test_breakdown_shares_capped():
    df = pf.normalize_per_solve(_synthetic())
    # PCSetUp (30 s one-time) must never exceed the per-solve wall in the
    # breakdown stacks (review finding: uncapped shares reached ~9500%)
    nx, dft = pf._gmres_at(df, None)
    tot = pf._col(dft, "time_total")
    rem = tot.copy()
    comp = {}
    for label, v in [("KSPSolve", pf._col(dft, "time_KSPSolve")),
                     ("PCSetUp", pf._col(dft, "time_PCSetUp"))]:
        w = pd.concat([v, rem], axis=1).min(axis=1)
        comp[label] = w
        rem = (rem - w).clip(lower=0.0)
    assert (comp["PCSetUp"] <= tot).all()


def test_all_figures_render(tmp_path):
    pf.all_figures(_synthetic(), tmp_path, sfx="_t")
    pngs = list(tmp_path.glob("*.png"))
    # metric bars (5) + scaling (2) + breakdown (2) + wall (2) + ksp (4)
    # + pc (2) + memory (1)
    assert len(pngs) >= 15, sorted(p.name for p in pngs)


def test_per_iteration_tables():
    out = pf.per_iteration_tables(_synthetic())
    assert "gmres" in out
    g = out["gmres"]
    assert (g.solve_per_iteration > 0).all()
