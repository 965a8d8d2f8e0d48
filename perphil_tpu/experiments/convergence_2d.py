"""2D convergence study for the conforming primal DPP formulation.

Parity with ``/root/reference/src/perphil/experiments/convergence_2d.py``:
  - ``SolverSpec``        (reference ``:45-48``)
  - ``run_one``           (reference ``:85-113``) — identical row schema
  - ``_default_solvers``  (reference ``:116-131``)
  - argparse ``main``     (reference ``:134-183``) — same flags, same CSV

Output rows carry {N, h, degree, quad, solver, it, res, e1_L2, e2_L2,
e1_H1s, e2_H1s}, diffing cleanly against
``notebooks/results-conforming-2d/convergence.csv``.
"""

from __future__ import annotations

import csv
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

from perphil_tpu.forms.spaces import (
    Function,
    MixedFunctionSpace,
    create_function_spaces,
    mixed_space,
)
from perphil_tpu.mesh.structured import create_mesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC
from perphil_tpu.solvers.parameters import (
    FIELDSPLIT_LU_PARAMS,
    LINEAR_SOLVER_PARAMS,
    PLAIN_GMRES_PARAMS,
)
from perphil_tpu.solvers.solver import solve_dpp
from perphil_tpu.utils.manufactured_solutions import exact_expressions
from perphil_tpu.utils.postprocessing import h1_seminorm_error, l2_error


@dataclass(frozen=True)
class SolverSpec:
    name: str
    params: Dict


def _build_bcs(W: MixedFunctionSpace, p1_expr, p2_expr) -> List[DirichletBC]:
    """Dirichlet BCs on the full boundary from manufactured pressures
    (reference ``:57-64``)."""
    return [DirichletBC(W.sub(0), p1_expr), DirichletBC(W.sub(1), p2_expr)]


def _errors_for_solution(
    W: MixedFunctionSpace, solution: Function, p1_exact, p2_exact
) -> Tuple[float, float, float, float]:
    """L2 and H1-seminorm errors for both fields (reference ``:67-77``)."""
    p1_h, p2_h = solution.split()
    return (
        float(l2_error(p1_h, p1_exact)),
        float(l2_error(p2_h, p2_exact)),
        float(h1_seminorm_error(p1_h, p1_exact)),
        float(h1_seminorm_error(p2_h, p2_exact)),
    )


def _mesh_size_h_from_N(N: int) -> float:
    return 1.0 / float(N)


def run_one(
    N: int, solver: SolverSpec, quad: bool, degree: int, params: DPPParameters
) -> dict:
    """One (mesh, solver) experiment row (reference ``:85-113``)."""
    mesh = create_mesh(N, N, quadrilateral=quad)
    _, V = create_function_spaces(mesh, pressure_deg=degree, pressure_family="CG")
    W = mixed_space(V)
    _, p1_expr, _, p2_expr = exact_expressions(mesh, params)
    bcs = _build_bcs(W, p1_expr, p2_expr)

    sol = solve_dpp(
        W, params, bcs=bcs, solver_parameters=solver.params,
        options_prefix=f"dpp_{solver.name}",
    )
    e1_l2, e2_l2, e1_h1s, e2_h1s = _errors_for_solution(
        W, sol.solution, p1_expr, p2_expr
    )
    return {
        "N": N,
        "h": _mesh_size_h_from_N(N),
        "degree": degree,
        "quad": int(quad),
        "solver": solver.name,
        "it": int(sol.iteration_number),
        "res": float(sol.residual_error),
        "e1_L2": e1_l2,
        "e2_L2": e2_l2,
        "e1_H1s": e1_h1s,
        "e2_H1s": e2_h1s,
    }


def _default_solvers(rtols: Iterable[float]) -> List[SolverSpec]:
    """Reference ``:116-131``: direct + GMRES/fieldsplit sweeps over rtols."""
    specs: List[SolverSpec] = [SolverSpec("mumps", LINEAR_SOLVER_PARAMS)]
    for rtol in rtols:
        gmres = dict(PLAIN_GMRES_PARAMS)
        gmres["ksp_rtol"] = rtol
        specs.append(SolverSpec(f"gmres_rtol={rtol:g}", gmres))
        fs = dict(FIELDSPLIT_LU_PARAMS)
        fs["ksp_type"] = "gmres"
        fs["ksp_rtol"] = rtol
        fs["ksp_atol"] = 1.0e-12
        specs.append(SolverSpec(f"fs-lu_gmres_rtol={rtol:g}", fs))
    return specs


def compute_eoc(rows: List[dict]) -> List[dict]:
    """Observed convergence slopes per (solver, error column) via least
    squares of log(err) vs log(h) — mirrors the EOC regression of
    ``notebooks/2d-convergence.py:225-236`` (convergence_eoc.csv schema)."""
    import numpy as np

    out = []
    solvers = sorted({r["solver"] for r in rows})
    for err in ("e1_L2", "e2_L2", "e1_H1s", "e2_H1s"):
        for s in solvers:
            sel = sorted((r["h"], r[err]) for r in rows if r["solver"] == s)
            if len(sel) < 2:
                continue
            h = np.log([x[0] for x in sel])
            e = np.log([x[1] for x in sel])
            slope = float(np.polyfit(h, e, 1)[0])
            out.append({"solver": s, "err": err, "slope": slope})
    return out


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="2D convergence experiment for conforming DPP (two pressures)"
    )
    ap.add_argument("--Ns", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument(
        "--degree",
        type=int,
        default=1,
        choices=[1, 2, 3, 4],
        help="Pressure-space polynomial degree (Qp on quad meshes via "
        "ops/tensorfem; degree>1 requires --tri to be absent). Reference "
        "forms/spaces.py:5-36 accepts arbitrary degree via Firedrake; every "
        "published artifact uses degree 1.",
    )
    ap.add_argument("--tri", action="store_true", help="Use triangles instead of quads")
    ap.add_argument("--rtols", type=float, nargs="+", default=[1e-8, 1e-10])
    ap.add_argument(
        "--out", type=Path, default=Path("results/conforming-2d/convergence.csv")
    )
    ap.add_argument("--eoc-out", type=Path, default=None,
                    help="Optional EOC-slope CSV (convergence_eoc.csv schema)")
    args = ap.parse_args(argv)

    quad = not args.tri
    params = DPPParameters()
    solvers = _default_solvers(args.rtols)
    rows: List[dict] = []
    for N in args.Ns:
        for spec in solvers:
            rows.append(run_one(N=N, solver=spec, quad=quad, degree=args.degree, params=params))

    args.out.parent.mkdir(parents=True, exist_ok=True)
    with args.out.open("w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    print(f"Wrote {args.out}")

    if args.eoc_out:
        eoc = compute_eoc(rows)
        args.eoc_out.parent.mkdir(parents=True, exist_ok=True)
        with args.eoc_out.open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["solver", "err", "slope"])
            writer.writeheader()
            writer.writerows(eoc)
        print(f"Wrote {args.eoc_out}")


if __name__ == "__main__":
    main()
