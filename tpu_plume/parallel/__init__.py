from tpu_plume.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_gail_carry,
    shard_loop_carry,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_gail_carry",
    "shard_loop_carry",
]
