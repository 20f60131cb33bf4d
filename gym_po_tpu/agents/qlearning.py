"""In-graph batched tabular Q-learning.

The suite's discrete-observation envs (taxi's whole state is one int,
reference ``extended_taxi.py:226``) are classic tabular domains; vanilla PPO
gets stuck in taxi's avoid-action-4 local optimum, while Q-learning's
per-transition credit assignment solves it outright.

TPU design: the Q-table lives on-device; B envs step in lockstep under one
``lax.scan``; every transition applies ``Q[s,a] += lr * td`` via
``scatter-add`` (duplicate (s,a) pairs within a batch accumulate — the
standard vectorized-Q approximation, exact as lr → 0).  Bootstrapping uses
the PRE-reset terminal observation from ``info["terminal_state"]`` so
autoreset never leaks next-episode value into the target; ``done`` cuts the
bootstrap, truncation does not (time limits are not environment dynamics).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import Discrete, Environment

__all__ = ["QConfig", "q_learning", "greedy_policy"]


class QConfig(NamedTuple):
    num_envs: int = 4096
    learning_rate: float = 0.1
    gamma: float = 0.99
    epsilon: float = 0.1  # epsilon-greedy exploration
    steps_per_update: int = 128  # scan length per jit call


def q_learning(
    env: Environment,
    config: QConfig,
    key: jax.Array,
    num_updates: int = 100,
    q_init: jax.Array | None = None,
):
    """Train a Q-table; returns (Q [n_obs, n_act], diagnostics history)."""
    if not isinstance(env.observation_space, Discrete) or not isinstance(
        env.action_space, Discrete
    ):
        raise ValueError("tabular Q-learning needs Discrete obs and actions")
    n_obs = int(env.observation_space.n)
    n_act = int(env.action_space.n)
    B = config.num_envs
    lr, gamma, eps = config.learning_rate, config.gamma, config.epsilon

    q = (
        q_init
        if q_init is not None
        else jnp.zeros((n_obs, n_act), jnp.float32)
    )
    key, kr = jax.random.split(key)
    obs, state = env.reset_vec(kr, B)

    @jax.jit
    def update(q, obs, state, key):
        def one_step(carry, _):
            q, obs, state, key = carry
            key, ke, ka, ks = jax.random.split(key, 4)
            greedy = jnp.argmax(q[obs], axis=-1).astype(jnp.int32)
            random_a = jax.random.randint(ka, (B,), 0, n_act)
            explore = jax.random.uniform(ke, (B,)) < eps
            action = jnp.where(explore, random_a, greedy)
            nobs, nstate, rew, done, trunc, info = env.step_vec(
                ks, state, action
            )
            # bootstrap from the PRE-reset terminal observation
            term_obs = env.observe(info["terminal_state"])
            next_v = jnp.max(q[term_obs], axis=-1)
            target = rew + gamma * next_v * (1.0 - done.astype(jnp.float32))
            td = target - q[obs, action]
            q = q.at[obs, action].add(lr * td)
            return (q, nobs, nstate, key), (rew.mean(), done.mean())

        (q, obs, state, key), (rews, dones) = jax.lax.scan(
            one_step, (q, obs, state, key), None, length=config.steps_per_update
        )
        return q, obs, state, key, rews.mean(), dones.mean()

    history = []
    for i in range(num_updates):
        q, obs, state, key, mean_r, done_rate = update(q, obs, state, key)
        history.append((float(mean_r), float(done_rate)))
    return q, history


def greedy_policy(q: jax.Array):
    """(key, obs[B]) -> argmax actions — plugs into vector.rollout."""

    def policy(key, obs):
        return jnp.argmax(q[obs], axis=-1).astype(jnp.int32)

    return policy
