"""Bit-exact NumPy-parity harness.

The reference consumes randomness from stateful ``np.random.Generator`` objects
in data-dependent order (masked partial resets draw only for finished envs,
rejection loops redraw, reference ``extended_taxi.py:344-364``).  That order
cannot be reproduced inside a fixed-shape jitted step — so we don't try.

Instead every environment factors its dynamics into *deterministic jitted
stages* that take randomness as explicit inputs.  A parity driver runs on the
host, mirrors the reference's exact ``Generator`` calls (same algorithms, same
seeding via ``SeedSequence``), and feeds the draws into the same jitted stages
used by perf mode.  If the deterministic stages are correct, full trajectories
match the reference bit-exactly under a fixed seed.

Perf mode (``Environment.step_env``) swaps the host draws for in-graph
counter-based ``jax.random`` with identical distributions; parity tests pin
this harness, benchmarks pin perf mode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["reference_rng", "TaxiParityDriver"]


def reference_rng(seed: int) -> np.random.Generator:
    """Replicates ``gymnasium.utils.seeding.np_random(seed)`` exactly."""
    return np.random.Generator(np.random.PCG64(np.random.SeedSequence(seed)))


class TaxiParityDriver:
    """Steps a batch of :class:`gym_po_tpu.envs.taxi.Taxi` instances with the
    reference ``TaxiVecEnv``'s exact RNG consumption order.

    Mirrored draw order per reference ``extended_taxi.py``:

    * ``reset(seed)``  -> ``multinomial(ns, dist, B).argmax(-1)`` (:348-350)
    * ``step``: task reset first — ``integers(nlocs, size=b)`` for p then d,
      rejection loop on ``p == d`` (:360-363) — then full reset multinomial
      for done|truncated envs (:286, :344-352).
    """

    def __init__(self, env, num_envs: int):
        from ..envs.taxi import TaxiState

        self.env = env
        self.B = int(num_envs)
        self.rng: np.random.Generator | None = None
        t = env.tables
        self._ns = t.ns
        self._dist = t.state_distribution
        self._nlocs = t.nlocs
        self._TaxiState = TaxiState

        self._advance = jax.jit(jax.vmap(env.advance))
        self._task_reset = jax.jit(jax.vmap(env.apply_task_reset))
        self._full_reset = jax.jit(jax.vmap(env.apply_full_reset))
        self._observe = jax.jit(jax.vmap(env.observe))

    # ------------------------------------------------------------------ api
    def reset(self, seed: int):
        self.rng = reference_rng(seed)
        zeros = jnp.zeros(self.B, jnp.int32)
        state = self._TaxiState(elapsed=zeros, s=zeros, completed=zeros)
        s_new = self.rng.multinomial(self._ns, self._dist, self.B).argmax(-1)
        state = self._full_reset(
            state, jnp.ones(self.B, bool), jnp.asarray(s_new, jnp.int32)
        )
        return np.asarray(self._observe(state)), state

    def step(self, state, actions: np.ndarray):
        mid, rew, done, trunc, task = self._advance(state, jnp.asarray(actions))
        task_np = np.asarray(task)
        p_new = np.zeros(self.B, np.int64)
        d_new = np.zeros(self.B, np.int64)
        b = int(task_np.sum())
        if b:
            p_idx = self.rng.integers(self._nlocs, size=b)
            d_idx = self.rng.integers(self._nlocs, size=b)
            while (m := (p_idx == d_idx)).any():
                d_idx[m] = self.rng.integers(self._nlocs, size=int(m.sum()))
            p_new[task_np] = p_idx
            d_new[task_np] = d_idx
        mid = self._task_reset(
            mid, task, jnp.asarray(p_new, jnp.int32), jnp.asarray(d_new, jnp.int32)
        )
        reset_np = np.asarray(done) | np.asarray(trunc)
        s_new = np.zeros(self.B, np.int64)
        b2 = int(reset_np.sum())
        if b2:
            s_new[reset_np] = self.rng.multinomial(self._ns, self._dist, b2).argmax(-1)
        state = self._full_reset(
            mid, jnp.asarray(reset_np), jnp.asarray(s_new, jnp.int32)
        )
        obs = np.asarray(self._observe(state))
        return obs, state, np.asarray(rew), np.asarray(done), np.asarray(trunc)
