from .networks import ActorCritic, make_actor_critic
from .ppo import (
    PPOConfig,
    TrainState,
    init_train_state,
    make_train_step,
    shard_train_state,
    train,
)

__all__ = [
    "ActorCritic",
    "make_actor_critic",
    "PPOConfig",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "shard_train_state",
    "train",
]
