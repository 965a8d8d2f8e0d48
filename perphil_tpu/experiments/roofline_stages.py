"""Per-stage roofline of the headline 64^3 fast-diagonalization pipeline.

Answers VERDICT r3 weak #2: the whole pipeline sits at ~25% of HBM
bandwidth — is that 4x of recoverable headroom, or a measured ceiling?
Each stage of ``MixedPrecisionDPPDirect.assemble_and_solve_df`` is timed
in isolation with the chained-execution protocol (K dependent runs inside
one ``lax.scan``; see CLAUDE.md on the dispatch-dominated cost model) and
located on the device roofline via XLA's own flop/byte counts
(``utils/roofline.py``).

Stages:

- ``rhs_assembly``      df stencil BC lift (``lifted_rhs_df``)
- ``f32_direct``        one full f32 fast-diag solve (both fields)
- ``fwd_transforms``    the 3 forward eigen-transforms x 2 fields
- ``mode_solve``        the per-mode 2x2 elementwise solve
- ``inv_transforms``    the 3 inverse transforms x 2 fields
- ``df_residual``       df monolithic matvec + subtraction (refinement)
- ``pipeline``          the whole assemble+solve (headline metric)

Writes ``notebooks/results-conforming-3d/roofline_stages_64cube.csv``;
``docs/benchmarks.md`` (via ``compare_with_reference.py``) renders the
table and the measured-ceiling narrative.

Usage: python -m perphil_tpu.experiments.roofline_stages [--size N] [--k K]
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Callable, List

from perphil_tpu.utils.marginal import chained_marginal, fn_chain_maker


def _chain_timer(fn: Callable, args, K: int) -> float:
    """Per-application seconds of ``fn`` via the shared chained-marginal
    protocol (``utils/marginal.py``): K is grown from a DISPATCH-FREE pilot
    marginal until the T(2K)-T(K) window reaches >= 0.25 s, so few-ms
    dispatch jitter moves even the microsecond-scale stage figures <1%."""
    return chained_marginal(fn_chain_maker(fn), args, K)


def run(size: int = 64, K: int = 20) -> List[dict]:
    import jax
    import jax.numpy as jnp

    from perphil_tpu.forms.spaces import _evaluate
    from perphil_tpu.mesh import create_cube_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.df32 import df_from_f64, df_sub
    from perphil_tpu.ops.direct import _transform
    from perphil_tpu.ops.mixed import MixedPrecisionDPPDirect
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d
    from perphil_tpu.utils.roofline import analyze_compiled

    mesh = create_cube_mesh(size, size, size, hexahedral=True)
    params = DPPParameters()
    solver = MixedPrecisionDPPDirect(mesh, params)
    fast = solver._fast32
    bdry = solver._bdry

    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    g1 = df_from_f64(_evaluate(p1e, mesh, ()))
    g2 = df_from_f64(_evaluate(p2e, mesh, ()))
    b1, b2 = jax.jit(solver.lifted_rhs_df)(g1, g2)
    b1f, b2f = b1[0], b2[0]
    inner = tuple(slice(1, n - 1) for n in mesh.node_shape)
    f1i = b1f[inner]
    f2i = b2f[inner]
    mats = [S for (S, _) in fast._eig]

    # ---- stage definitions: (name, fn, feedback, args) ----------------
    def rhs(g1, g2):
        return solver.lifted_rhs_df(g1, g2)

    def f32_direct(x1, x2):
        return fast.solve(x1, x2)

    def fwd(x1, x2):
        return (
            _transform(x1, mats, transpose=True),
            _transform(x2, mats, transpose=True),
        )

    def inv(x1, x2):
        return (
            _transform(x1, mats, transpose=False),
            _transform(x2, mats, transpose=False),
        )

    a11, a22, det = (jnp.asarray(m, jnp.float32) for m in fast._mode_data)
    a12 = jnp.float32(-params.beta / params.mu)

    def mode_solve(f1h, f2h):
        u1h = (a22 * f1h - a12 * f2h) / det
        u2h = (a11 * f2h - a12 * f1h) / det
        return u1h, u2h

    def df_residual(z1, z2):
        y1, y2 = solver._df_matvec(z1, z2, bdry)
        return df_sub((b1[0], b1[1]), y1), df_sub((b2[0], b2[1]), y2)

    def pipeline(g1, g2):
        return solver.assemble_and_solve_df(g1, g2)

    stages = [
        ("rhs_assembly", rhs, (g1, g2)),
        ("f32_direct", f32_direct, (b1f, b2f)),
        ("fwd_transforms", fwd, (f1i, f2i)),
        ("mode_solve", mode_solve, (f1i, f2i)),
        ("inv_transforms", inv, (f1i, f2i)),
        ("df_residual", df_residual, (g1, g2)),
        ("pipeline", pipeline, (g1, g2)),
    ]

    rows = []
    for name, fn, args in stages:
        dt = _chain_timer(fn, args, K)
        point = analyze_compiled(name, fn, args, dt)
        row = point.as_dict()
        rows.append(row)
        print(
            f"[roofline] {name}: {dt*1e3:.3f} ms, {point.gflops:.0f} GF/s, "
            f"{point.gbs:.0f} GB/s ({point.hbm_frac:.1%} HBM), {point.bound}-bound",
            flush=True,
        )
    return rows


def save(rows: List[dict], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)
    out = args.out or (
        Path(__file__).parents[2]
        / "notebooks"
        / "results-conforming-3d"
        / f"roofline_stages_{args.size}cube.csv"
    )
    rows = run(args.size, args.k)
    save(rows, out)
    print(f"[roofline] wrote {len(rows)} rows -> {out}")


if __name__ == "__main__":
    main()
