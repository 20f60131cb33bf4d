from .fused_rocksample import make_fused_rocksample_rollout
from .fused_rooms import make_fused_rooms_rollout
from .fused_taxi import make_fused_taxi_rollout
from .gather import (
    ONE_HOT_MAX_TABLE,
    assert_one_hot_exact,
    row_gather,
    table_gather,
)

__all__ = [
    "table_gather",
    "row_gather",
    "ONE_HOT_MAX_TABLE",
    "assert_one_hot_exact",
    "make_fused_taxi_rollout",
    "make_fused_rooms_rollout",
    "make_fused_rocksample_rollout",
]
