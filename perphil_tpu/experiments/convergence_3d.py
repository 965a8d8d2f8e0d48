"""3D h-convergence study on unit-cube meshes (hex or tet).

The reference has no 3D convergence CLI (its 3D coverage is the profiling
and conditioning notebooks), but the benchmark configs call for "3D
monolithic DPP on unit-cube hex meshes 8^3 -> 32^3 with exact_expressions_3d
BCs" — this driver provides that study with the same row schema as
``convergence_2d`` (reference ``convergence_2d.py:85-113``).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List

from perphil_tpu.experiments.convergence_2d import SolverSpec, compute_eoc
from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
from perphil_tpu.mesh.structured import create_cube_mesh
from perphil_tpu.models.dpp.parameters import DPPParameters
from perphil_tpu.ops.assembly import DirichletBC
from perphil_tpu.solvers.parameters import (
    FIELDSPLIT_LU_PARAMS,
    GMRES_PARAMS,
    LINEAR_SOLVER_PARAMS,
)
from perphil_tpu.solvers.solver import solve_dpp
from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d
from perphil_tpu.utils.postprocessing import h1_seminorm_error, l2_error


def run_one_3d(
    N: int, solver: SolverSpec, hexahedral: bool, params: DPPParameters,
    quadrature_degree: int = 10,
) -> dict:
    mesh = create_cube_mesh(N, N, N, hexahedral=hexahedral)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    sol = solve_dpp(W, params, bcs=bcs, solver_parameters=solver.params)
    p1h, p2h = sol.solution.split()
    return {
        "N": N,
        "h": 1.0 / N,
        "degree": 1,
        "hex": int(hexahedral),
        "solver": solver.name,
        "it": int(sol.iteration_number),
        "res": float(sol.residual_error),
        "e1_L2": float(l2_error(p1h, p1e, quadrature_degree)),
        "e2_L2": float(l2_error(p2h, p2e, quadrature_degree)),
        "e1_H1s": float(h1_seminorm_error(p1h, p1e, quadrature_degree)),
        "e2_H1s": float(h1_seminorm_error(p2h, p2e, quadrature_degree)),
    }


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="3D convergence experiment (DPP)")
    ap.add_argument("--Ns", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--tet", action="store_true", help="tetrahedra instead of hexes")
    ap.add_argument("--out", type=Path,
                    default=Path("results/conforming-3d/convergence_3d.csv"))
    ap.add_argument("--eoc-out", type=Path, default=None)
    args = ap.parse_args(argv)

    params = DPPParameters()
    solvers = [
        SolverSpec("mumps", LINEAR_SOLVER_PARAMS),
        SolverSpec("fs-lu_gmres", {**GMRES_PARAMS, **FIELDSPLIT_LU_PARAMS}),
    ]
    rows: List[Dict] = []
    for N in args.Ns:
        for spec in solvers:
            row = run_one_3d(N, spec, hexahedral=not args.tet, params=params)
            rows.append(row)
            print(row)

    args.out.parent.mkdir(parents=True, exist_ok=True)
    with args.out.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"Wrote {args.out}")
    if args.eoc_out:
        eoc = compute_eoc(rows)
        with args.eoc_out.open("w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["solver", "err", "slope"])
            w.writeheader()
            w.writerows(eoc)
        print(f"Wrote {args.eoc_out}")


if __name__ == "__main__":
    main()
