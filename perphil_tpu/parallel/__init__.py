"""Parallelism: device meshes, sharded solves, explicit halo exchange,
multi-host runtime (SURVEY §2.2)."""

from perphil_tpu.parallel.distributed import (
    global_device_mesh,
    initialize_from_env,
    is_initialized,
)
from perphil_tpu.parallel.sharding import (
    device_mesh,
    field_spec,
    shard_grid,
    shard_stacked,
    sharded_solve_dpp,
)

__all__ = [
    "device_mesh",
    "field_spec",
    "global_device_mesh",
    "initialize_from_env",
    "is_initialized",
    "shard_grid",
    "shard_stacked",
    "sharded_solve_dpp",
]
