"""Actor-critic networks for the Podracer learner.

The reference ships no agents (SURVEY.md §0); this is the learner half of the
north-star config ("Podracer-style PPO consuming sharded rollouts").  Design
notes for TPU:

* observations are embedded to a fixed feature width so the hot path is
  dense matmuls that tile onto the MXU;
* compute dtype is a constructor knob — ``bfloat16`` halves HBM traffic and
  doubles MXU throughput; params and the final logits/value head stay
  ``float32`` for stable optimization;
* everything is shape-static and jit/vmap/scan/shard_map-safe.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core import Box, Discrete, Space

__all__ = ["ActorCritic", "obs_features", "make_actor_critic"]


def obs_features(space: Space) -> int:
    """Feature width of the flat encoding of an observation space."""
    if isinstance(space, Discrete):
        return int(space.n)
    if isinstance(space, Box):
        return int(np.prod(space.shape)) if space.shape else 1
    raise TypeError(f"Unsupported observation space {space!r}")


def encode_obs(space: Space, obs: jax.Array, dtype: Any) -> jax.Array:
    """Flat-encode a raw observation: one-hot for Discrete, flatten for Box.

    One-hot × dense-layer is a gather expressed as a matmul — exactly what
    the MXU wants for the small discrete POMDP observation spaces here.
    """
    if isinstance(space, Discrete):
        return jax.nn.one_hot(obs, space.n, dtype=dtype)
    flat = obs.reshape(*obs.shape[: obs.ndim - len(space.shape)], -1)
    return flat.astype(dtype)


class ActorCritic(nn.Module):
    """MLP torso with categorical (Discrete) or Gaussian (Box) policy head."""

    obs_space: Space
    action_space: Space
    hidden: Sequence[int] = (64, 64)
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array) -> Tuple[Any, jax.Array]:
        x = encode_obs(self.obs_space, obs, self.compute_dtype)
        kinit = nn.initializers.orthogonal(float(np.sqrt(2)))
        for width in self.hidden:
            x = nn.Dense(
                width, kernel_init=kinit, dtype=self.compute_dtype
            )(x)
            x = nn.tanh(x)
        if isinstance(self.action_space, Discrete):
            logits = nn.Dense(
                self.action_space.n,
                kernel_init=nn.initializers.orthogonal(0.01),
                dtype=jnp.float32,
            )(x)
            pi = {"kind": "categorical", "logits": logits.astype(jnp.float32)}
        else:
            adim = int(np.prod(self.action_space.shape)) or 1
            mean = nn.Dense(
                adim,
                kernel_init=nn.initializers.orthogonal(0.01),
                dtype=jnp.float32,
            )(x)
            log_std = self.param(
                "log_std", nn.initializers.zeros, (adim,), jnp.float32
            )
            pi = {
                "kind": "gaussian",
                "mean": mean.astype(jnp.float32),
                "log_std": log_std,
            }
        value = nn.Dense(
            1, kernel_init=nn.initializers.orthogonal(1.0), dtype=jnp.float32
        )(x)
        return pi, jnp.squeeze(value.astype(jnp.float32), -1)


# ---------------------------------------------------------------- policies
def sample_action(pi, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sample an action and its log-prob from a policy head output."""
    if pi["kind"] == "categorical":
        action = jax.random.categorical(key, pi["logits"])
        logp = log_prob(pi, action)
        return action, logp
    std = jnp.exp(pi["log_std"])
    eps = jax.random.normal(key, pi["mean"].shape)
    action = pi["mean"] + std * eps
    return action, log_prob(pi, action)


def log_prob(pi, action: jax.Array) -> jax.Array:
    if pi["kind"] == "categorical":
        logits = jax.nn.log_softmax(pi["logits"])
        return jnp.take_along_axis(
            logits, action[..., None].astype(jnp.int32), axis=-1
        )[..., 0]
    std = jnp.exp(pi["log_std"])
    z = (action - pi["mean"]) / std
    return jnp.sum(
        -0.5 * z**2 - pi["log_std"] - 0.5 * jnp.log(2 * jnp.pi), axis=-1
    )


def entropy(pi) -> jax.Array:
    if pi["kind"] == "categorical":
        logp = jax.nn.log_softmax(pi["logits"])
        return -jnp.sum(jnp.exp(logp) * logp, axis=-1)
    return jnp.sum(pi["log_std"] + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def make_actor_critic(
    env, hidden: Sequence[int] = (64, 64), compute_dtype: Any = jnp.float32
) -> ActorCritic:
    return ActorCritic(
        obs_space=env.observation_space,
        action_space=env.action_space,
        hidden=tuple(hidden),
        compute_dtype=compute_dtype,
    )
