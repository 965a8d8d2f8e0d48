"""Strong/weak scaling harness over device meshes.

The reference scales by mesh resolution only and never exercises its MPI
domain decomposition in an experiment (SURVEY §2.2); the TPU rebuild's
domain decomposition is XLA SPMD over a ``jax.sharding.Mesh``
(``parallel/sharding.py``), and this module measures how solve time scales
with the device count:

- **strong scaling**: fixed problem size, growing device mesh —
  ``efficiency = t_1 / (k * t_k)``.
- **weak scaling**: problem size grown with the device count so the
  per-device share stays constant (``N_k ~ N_1 * k^(1/dim)``) —
  ``efficiency = t_1 / t_k``.

The sweep runs on whatever devices JAX exposes: a TPU pod slice in
production, or the virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``) for harness validation on a
development host — the same programs, shardings, and collectives compile
either way (GSPMD partitions once per mesh shape). CSV schema:
``mode,devices,mesh_axes,N,dofs,approach,iterations,time_s,speedup,efficiency``.

Usage::

    python -m perphil_tpu.experiments.scaling [--mode strong weak]
        [--devices 1 2 4 8] [--n 64] [--dim 2] [--repeats 3] [--out CSV]

(On a host without 8 real chips, run under ``JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8``; the module forces
the CPU backend itself when it detects fewer real devices than requested.)
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

__all__ = ["ScalingRow", "run_scaling", "save_scaling_csv", "main"]


@dataclass
class ScalingRow:
    mode: str
    devices: int
    mesh_axes: str
    N: int
    dofs: int
    approach: str
    iterations: int
    time_s: float
    # speedup/efficiency are chip measurements: populated only on real
    # device meshes. On a virtual mesh (k "devices" time-slicing one host)
    # they are physically meaningless and left EMPTY — the valid
    # virtual-mesh quantities are the halo/collective/parity columns below.
    speedup: Any
    efficiency: Any
    # device platform ("cpu" = virtual mesh: harness validation only — all
    # k devices share one host's cores, so efficiencies are NOT indicative
    # of ICI scaling; "tpu" = real chips)
    platform: str = "unknown"
    # --- quantities that ARE physically meaningful on a virtual mesh ---
    # (the sharding/collective STRUCTURE is identical to a real pod slice:
    # GSPMD partitions the same program either way)
    # bytes each interior device sends per halo exchange (both neighbor
    # planes, both pressure fields, df32 storage)
    halo_bytes_per_exchange: int = 0
    # collective ops in the compiled sharded stacked-matvec program,
    # counted from its post-GSPMD HLO: "cp"=collective-permute (halo),
    # "ar"=all-reduce, "ag"=all-gather
    matvec_collectives: str = ""
    # iteration-count parity vs the single-device solve of the same system
    its_single_device: int = -1
    iteration_parity: bool = False
    # first-class provenance column: "virtual-mesh-validation" rows carry
    # physically meaningless efficiencies (time-sliced host cores) and must
    # never be quoted as chip measurements; "tpu-chained" = real devices
    measurement_class: str = ""

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)


def _halo_bytes(dof_shape, dmesh, bytes_per_elem: int = 8) -> int:
    """Bytes an interior device sends per halo exchange: one boundary plane
    per split mesh axis per direction, both fields, df32 (two-f32) words."""
    import numpy as _np

    total = 0
    axes = dmesh.devices.shape
    nplanes = 0
    for ax, k in enumerate(axes):
        if k > 1:
            plane = int(_np.prod(dof_shape)) // int(dof_shape[ax])
            total += 2 * plane  # two neighbor planes along this axis
            nplanes += 1
    return total * 2 * bytes_per_elem if nplanes else 0


def _matvec_collectives(W, params, dmesh, padding) -> str:
    """Count collective ops in the compiled sharded stacked-matvec HLO —
    the measurable virtual-mesh twin of 'halo exchange over ICI'."""
    import jax
    import jax.numpy as jnp

    from perphil_tpu.ops.assembly import DPPOperator
    from perphil_tpu.parallel.sharding import shard_stacked

    try:
        op = DPPOperator(W, params, padding)
        mv = op.stacked_matvec()
        x = shard_stacked(jnp.zeros((2,) + op.grid_shape), dmesh)
        txt = jax.jit(mv).lower(x).compile().as_text()
        cp = txt.count("collective-permute")
        ar = txt.count("all-reduce")
        ag = txt.count("all-gather")
        return f"cp={cp};ar={ar};ag={ag}"
    except Exception as exc:  # diagnostics column must not kill the sweep
        return f"unavailable({type(exc).__name__})"


def _weak_size(base_n: int, k: int, dim: int) -> int:
    """Grow N so cells-per-device stays ~constant: N_k = N_1 * k^(1/dim)."""
    return max(1, round(base_n * k ** (1.0 / dim)))


def _solve_timed(W, params, bcs, dmesh, sp_dict, repeats: int):
    """Warm-up (compile) once, then time `repeats` full solves."""
    from perphil_tpu.parallel.sharding import sharded_solve_dpp

    sol = sharded_solve_dpp(W, params, bcs, dmesh, solver_parameters=sp_dict)
    t0 = time.perf_counter()
    for _ in range(repeats):
        sol = sharded_solve_dpp(W, params, bcs, dmesh, solver_parameters=sp_dict)
    dt = (time.perf_counter() - t0) / repeats
    return sol, dt


def run_scaling(
    modes: Sequence[str] = ("strong", "weak"),
    device_counts: Sequence[int] = (1, 2, 4, 8),
    base_n: int = 64,
    dim: int = 2,
    approaches: Optional[Sequence] = None,
    repeats: int = 3,
) -> List[ScalingRow]:
    import jax

    from perphil_tpu.experiments.iterative_bench import (
        Approach,
        default_model_params,
        params_for,
    )
    from perphil_tpu.forms.spaces import create_function_spaces, mixed_space
    from perphil_tpu.mesh.structured import create_cube_mesh, create_mesh
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.parallel.sharding import device_mesh
    from perphil_tpu.utils.manufactured_solutions import (
        exact_expressions,
        exact_expressions_3d,
    )

    approaches = list(approaches or [Approach.SS_GMRES, Approach.GMRES_ILU])
    avail = jax.device_count()
    device_counts = [k for k in device_counts if k <= avail]
    params = default_model_params()

    def _setup(N: int):
        if dim == 3:
            mesh = create_cube_mesh(N, N, N, hexahedral=True)
            exacts = exact_expressions_3d(mesh, params)
        else:
            mesh = create_mesh(N, N)
            exacts = exact_expressions(mesh, params)
        _, V = create_function_spaces(mesh)
        W = mixed_space(V)
        _, p1e, _, p2e = exacts
        bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
        return mesh, W, bcs

    axis = ("z",) if dim == 3 else ("y",)
    virtual = jax.devices()[0].platform == "cpu"
    rows: List[ScalingRow] = []
    for ap in approaches:
        sp_dict = params_for(ap)
        single_its: Dict[int, int] = {}
        for mode in modes:
            t1: Optional[float] = None
            for k in device_counts:
                N = base_n if mode == "strong" else _weak_size(base_n, k, dim)
                mesh, W, bcs = _setup(N)
                dmesh = device_mesh([k], axis_names=axis)
                sol, dt = _solve_timed(W, params, bcs, dmesh, sp_dict, repeats)
                if N not in single_its:
                    if k == 1:
                        single_its[N] = sol.iteration_number
                    else:
                        ref = _solve_timed(
                            W, params, bcs, device_mesh([1], axis_names=axis),
                            sp_dict, 1,
                        )[0]
                        single_its[N] = ref.iteration_number
                if t1 is None:
                    t1 = dt
                    speedup, eff = 1.0, 1.0
                elif mode == "strong":
                    speedup = t1 / dt
                    eff = speedup / k
                else:
                    speedup = k * (t1 / dt)  # useful-work rate vs 1 device
                    eff = t1 / dt
                from perphil_tpu.parallel.sharding import mesh_padding

                dof_shape = W.spaces[0].dof_mesh.node_shape
                padding = mesh_padding(dof_shape, dmesh)
                if not any(padding):
                    padding = ()
                row = ScalingRow(
                    mode=mode,
                    devices=k,
                    mesh_axes="x".join(str(s) for s in dmesh.devices.shape),
                    N=N,
                    dofs=W.dim(),
                    approach=ap.value,
                    iterations=sol.iteration_number,
                    time_s=dt,
                    speedup="" if virtual else speedup,
                    efficiency="" if virtual else eff,
                    halo_bytes_per_exchange=_halo_bytes(
                        tuple(
                            s + p
                            for s, p in zip(
                                dof_shape, padding or (0,) * len(dof_shape)
                            )
                        ),
                        dmesh,
                    ),
                    matvec_collectives=_matvec_collectives(
                        W, params, dmesh, padding
                    ),
                    its_single_device=single_its[N],
                    iteration_parity=(
                        sol.iteration_number == single_its[N]
                    ),
                    platform=jax.devices()[0].platform,
                    measurement_class=(
                        "virtual-mesh-validation" if virtual else "tpu-chained"
                    ),
                )
                rows.append(row)
                print(
                    f"[scaling] {ap.value} {mode} k={k} N={N}: "
                    f"its={row.iterations} (1-dev {single_its[N]}) "
                    f"t={dt:.4g}s halo={row.halo_bytes_per_exchange}B "
                    f"{row.matvec_collectives}",
                    flush=True,
                )
    return rows


def save_scaling_csv(rows: List[ScalingRow], path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(ScalingRow.__dataclass_fields__))
        w.writeheader()
        for r in rows:
            w.writerow(r.to_dict())


def main(argv: Optional[List[str]] = None) -> None:
    import argparse
    import os

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--mode", nargs="+", default=["strong", "weak"])
    parser.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--dim", type=int, default=2, choices=(2, 3))
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--out", default=None)
    parser.add_argument(
        "--platform",
        default="cpu",
        choices=("cpu", "default"),
        help="cpu (default): virtual device mesh on the host CPU — safe on "
        "single-chip dev machines; default: whatever JAX exposes (use on a "
        "real pod slice)",
    )
    args = parser.parse_args(argv)

    want = max(args.devices)
    if args.platform == "cpu":
        # must precede backend initialization; also wins over sitecustomize
        # files that force an accelerator platform at interpreter start
        if "device_count" not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={want}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax  # noqa: F401  (backend as configured by the environment)

    rows = run_scaling(
        modes=args.mode,
        device_counts=args.devices,
        base_n=args.n,
        dim=args.dim,
        repeats=args.repeats,
    )
    out = args.out or (
        Path(__file__).resolve().parents[2]
        / "notebooks"
        / f"results-conforming-{args.dim}d"
        / "scaling"
        / "scaling.csv"
    )
    save_scaling_csv(rows, out)
    print(f"[scaling] wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main()
