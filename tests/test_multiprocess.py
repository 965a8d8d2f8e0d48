"""Multi-host path: a sharded solve over 2 processes x 4 virtual devices
matches the single-process solve (SURVEY §2.2 "distributed comm backend" —
the reference's analogue is an ``mpiexec -n 2`` PETSc run).

The test launches two fresh interpreters (the multi-controller runtime
cannot share this pytest process), waits for rank 0's JSON result, and
compares against the same problem solved in-process on the 8-device
virtual mesh.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import jax
import pytest

# slow: spawns a 2-process jax.distributed run; run with PERPHIL_RUN_SLOW=1 or -m slow (CI does)
pytestmark = pytest.mark.slow


WORKER = Path(__file__).parent / "_mp_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_result():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port), "4"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=WORKER.parent.parent,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
    line = next(
        (ln for ln in outs[0][1].splitlines() if ln.startswith("MPRESULT ")), None
    )
    assert line, f"rank 0 produced no result:\n{outs[0][1][-2000:]}"
    return json.loads(line[len("MPRESULT "):])


def _single_process_reference():
    import jax.numpy as jnp

    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.mesh import create_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers import solve_dpp
    from perphil_tpu.solvers.parameters import FIELDSPLIT_LU_PARAMS, GMRES_PARAMS
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    N = 16
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]
    sol = solve_dpp(
        W, params, bcs,
        solver_parameters={**GMRES_PARAMS, **FIELDSPLIT_LU_PARAMS},
    )
    z1, z2 = sol.solution.data
    znorm = float(jnp.sqrt(jnp.vdot(z1, z1).real + jnp.vdot(z2, z2).real))
    return sol.iteration_number, znorm, sol.residual_error


def test_two_process_solve_matches_single_process(mp_result):
    its_ref, znorm_ref, rnorm_ref = _single_process_reference()
    # iteration counts can shift by 1 at a convergence boundary when the
    # psum reduction order changes; the solution itself must agree
    assert abs(mp_result["its"] - its_ref) <= 1
    assert mp_result["znorm"] == pytest.approx(znorm_ref, rel=1e-8)
    assert mp_result["rnorm"] == pytest.approx(rnorm_ref, rel=1e-3, abs=1e-12)


def test_initialize_from_env_noop_single_process(monkeypatch):
    from perphil_tpu.parallel import initialize_from_env

    monkeypatch.delenv("PERPHIL_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_from_env() is False
    assert jax.process_count() == 1
