"""One rank of the multi-process sharded-solve test (see
``test_multiprocess.py``). Launched as:

    python tests/_mp_worker.py <pid> <nproc> <port> <local_devices>

Prints one JSON line (rank 0 only) with iteration count, residual and
solution norms for comparison against the single-process run.
"""

import json
import os
import sys


def main() -> None:
    pid, nproc, port, local = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local}"
    os.environ["PERPHIL_NUM_PROCESSES"] = str(nproc)
    os.environ["PERPHIL_PROCESS_ID"] = str(pid)
    os.environ["PERPHIL_COORDINATOR"] = f"127.0.0.1:{port}"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from perphil_tpu.parallel import (
        global_device_mesh,
        initialize_from_env,
        sharded_solve_dpp,
    )

    assert initialize_from_env(), "distributed runtime failed to start"
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * local

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from perphil_tpu.forms import create_function_spaces, mixed_space
    from perphil_tpu.mesh import create_mesh
    from perphil_tpu.models.dpp import DPPParameters
    from perphil_tpu.ops.assembly import DirichletBC
    from perphil_tpu.solvers.parameters import FIELDSPLIT_LU_PARAMS, GMRES_PARAMS
    from perphil_tpu.utils.manufactured_solutions import exact_expressions

    N = 16
    mesh = create_mesh(N, N)
    _, V = create_function_spaces(mesh)
    W = mixed_space(V)
    params = DPPParameters()
    _, p1e, _, p2e = exact_expressions(mesh, params)
    bcs = [DirichletBC(W.sub(0), p1e), DirichletBC(W.sub(1), p2e)]

    dmesh = global_device_mesh([nproc * local], axis_names=("y",))
    sol = sharded_solve_dpp(
        W, params, bcs, dmesh,
        solver_parameters={**GMRES_PARAMS, **FIELDSPLIT_LU_PARAMS},
    )

    # global L2 norms of the two pressure fields (jitted reduction across
    # all processes' shards; replicated output is host-readable everywhere)
    z1, z2 = sol.solution.data
    rep = NamedSharding(dmesh, P())
    norm = jax.jit(
        lambda a, b: jnp.sqrt(jnp.vdot(a, a).real + jnp.vdot(b, b).real),
        out_shardings=rep,
    )(z1, z2)
    result = {
        "its": sol.iteration_number,
        "rnorm": sol.residual_error,
        "znorm": float(norm),
    }
    if pid == 0:
        print("MPRESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
