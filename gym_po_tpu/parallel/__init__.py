from .mesh import (
    DATA_AXIS,
    distributed_init,
    make_mesh,
    put_global,
    shard_batch,
    sharded_rollout,
)
from .data_parallel import chunk_seeds, replicate, shard_fused_trainer

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "distributed_init",
    "sharded_rollout",
    "shard_batch",
    "put_global",
    "shard_fused_trainer",
    "chunk_seeds",
    "replicate",
]
