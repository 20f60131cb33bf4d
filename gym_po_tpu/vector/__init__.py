from .chunked import DISPATCH_BATCH, chunked_rollout, make_chunked_step
from .vec_env import (
    EpisodeStatsState,
    RecordEpisodeStatistics,
    Transition,
    VecEnv,
    rollout,
)

__all__ = [
    "VecEnv",
    "Transition",
    "rollout",
    "chunked_rollout",
    "make_chunked_step",
    "DISPATCH_BATCH",
    "RecordEpisodeStatistics",
    "EpisodeStatsState",
]
