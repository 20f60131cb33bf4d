from .mesh import (
    DATA_AXIS,
    distributed_init,
    make_mesh,
    shard_batch,
    sharded_rollout,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "distributed_init",
    "sharded_rollout",
    "shard_batch",
]
