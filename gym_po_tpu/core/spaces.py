"""Framework-native space descriptions.

The reference builds on ``gymnasium.spaces`` (e.g. reference
``gym_po/envs/rooms/rooms.py:141-143``); here spaces are lightweight, jit-friendly
descriptions with counter-based PRNG sampling.  A ``to_gymnasium()`` escape hatch
provides drop-in interop for users migrating from the reference API.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Space", "Discrete", "Box", "batch_space"]


class Space:
    """Base class for observation/action space descriptions."""

    shape: Tuple[int, ...]
    dtype: Any

    def sample(self, key: jax.Array) -> jax.Array:
        raise NotImplementedError

    def sample_vec(self, key: jax.Array, num: int) -> jax.Array:
        """Batch of samples from ONE key (cheaper than vmap(sample) over
        split keys — one threefry call instead of ``num`` splits + draws)."""
        return jax.vmap(self.sample)(jax.random.split(key, num))

    def contains(self, x) -> bool:
        raise NotImplementedError

    def to_gymnasium(self):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    """``{0, 1, ..., n-1}``."""

    n: int
    dtype: Any = jnp.int32

    @property
    def shape(self) -> Tuple[int, ...]:
        return ()

    def sample(self, key: jax.Array) -> jax.Array:
        return jax.random.randint(key, (), 0, self.n, dtype=self.dtype)

    def sample_vec(self, key: jax.Array, num: int) -> jax.Array:
        return jax.random.randint(key, (num,), 0, self.n, dtype=self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(np.all((x >= 0) & (x < self.n)))

    def to_gymnasium(self):
        import gymnasium

        return gymnasium.spaces.Discrete(int(self.n))


@dataclasses.dataclass(frozen=True)
class Box(Space):
    """Bounded box in R^shape (bounds broadcast to ``shape``)."""

    low: Union[float, np.ndarray]
    high: Union[float, np.ndarray]
    shape: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    def __post_init__(self):
        object.__setattr__(self, "shape", tuple(self.shape))

    @property
    def low_arr(self) -> np.ndarray:
        return np.broadcast_to(np.asarray(self.low), self.shape)

    @property
    def high_arr(self) -> np.ndarray:
        return np.broadcast_to(np.asarray(self.high), self.shape)

    def sample(self, key: jax.Array) -> jax.Array:
        return self._sample_shaped(key, self.shape)

    def sample_vec(self, key: jax.Array, num: int) -> jax.Array:
        return self._sample_shaped(key, (num, *self.shape))

    def _sample_shaped(self, key: jax.Array, shape) -> jax.Array:
        low = jnp.asarray(self.low_arr, dtype=self.dtype)
        high = jnp.asarray(self.high_arr, dtype=self.dtype)
        finite = jnp.isfinite(low) & jnp.isfinite(high)
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        lo = jnp.where(finite, low, -1.0).astype(jnp.float32)
        hi = jnp.where(finite, high, 1.0).astype(jnp.float32)
        return (lo + u * (hi - lo)).astype(self.dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return bool(
            x.shape == self.shape
            and np.all(x >= self.low_arr - 1e-6)
            and np.all(x <= self.high_arr + 1e-6)
        )

    def to_gymnasium(self):
        import gymnasium

        np_dtype = np.dtype(jnp.zeros((), self.dtype).dtype)
        return gymnasium.spaces.Box(
            self.low_arr.astype(np_dtype),
            self.high_arr.astype(np_dtype),
            self.shape,
            dtype=np_dtype,
        )


def batch_space(space: Space, num: int) -> Space:
    """Add a leading batch axis of size ``num`` (reference: gymnasium
    ``batch_space``, used e.g. at reference ``extended_taxi.py:194``)."""
    if isinstance(space, Discrete):
        return Box(0, space.n - 1, (num,), dtype=space.dtype)
    if isinstance(space, Box):
        return Box(
            np.broadcast_to(space.low_arr, (num, *space.shape)),
            np.broadcast_to(space.high_arr, (num, *space.shape)),
            (num, *space.shape),
            dtype=space.dtype,
        )
    raise TypeError(f"Cannot batch {type(space)}")
