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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "reference_rng",
    "TaxiParityDriver",
    "RoomsParityDriver",
    "CRoomsParityDriver",
    "CarFlagParityDriver",
    "MSRoomsParityDriver",
]


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


class RoomsParityDriver:
    """Steps a batch of :class:`gym_po_tpu.envs.rooms.Rooms` with the reference
    ``RoomsEnv``'s exact RNG consumption order.

    Mirrored draw order per reference ``gym_po/envs/rooms/rooms.py``:

    * ``reset(seed)``  -> goal draw then agent draw, each
      ``choice(valid_states, B)`` when random, nothing when fixed (:186-187)
    * ``step``: ``random(B)`` uniforms for action failure (:210 via
      ``action_utils.py:84``), then masked reset draws goal-then-agent for the
      ``b`` finished envs only (:191-196).

    Executed actions are resolved on the host in float64 (same cumsum
    comparison as the reference) to avoid f32 boundary flips, then fed into
    the same jitted deterministic stages perf mode uses.
    """

    def __init__(self, env, num_envs: int):
        from ..envs.rooms import RoomsState

        self.env = env
        self.B = int(num_envs)
        self.rng: np.random.Generator | None = None
        self._RoomsState = RoomsState

        self._advance = jax.jit(jax.vmap(env.advance))
        self._apply_reset = jax.jit(jax.vmap(env.apply_reset))
        self._observe = jax.jit(jax.vmap(env.observe))

    def _sample_spawns(self, b: int):
        """goal-then-agent draw order (reference rooms.py:186-187,195-196)."""
        env = self.env
        if env.fixed_goal_yx is not None:
            goal = np.broadcast_to(env.fixed_goal_yx, (b, 2)).copy()
        else:
            goal = np.array(
                np.unravel_index(
                    self.rng.choice(env.valid_states, b), env.grid_np.shape
                )
            ).swapaxes(0, 1)
        if env.fixed_agent_yx is not None:
            agent = np.broadcast_to(env.fixed_agent_yx, (b, 2)).copy()
        else:
            agent = np.array(
                np.unravel_index(
                    self.rng.choice(env.valid_states, b), env.grid_np.shape
                )
            ).swapaxes(0, 1)
        return goal, agent

    def reset(self, seed: int):
        self.rng = reference_rng(seed)
        goal, agent = self._sample_spawns(self.B)
        state = self._RoomsState(
            elapsed=jnp.zeros(self.B, jnp.int32),
            agent_yx=jnp.asarray(agent, jnp.int32),
            goal_yx=jnp.asarray(goal, jnp.int32),
        )
        return np.asarray(self._observe(state)), state

    def step(self, state, actions: np.ndarray):
        from ..utils.actions import exec_action_np

        u = self.rng.random(self.B)
        executed = exec_action_np(self.env._cum, np.asarray(actions), u)
        mid, rew, done, trunc = self._advance(state, jnp.asarray(executed, jnp.int32))
        mask = np.asarray(done) | np.asarray(trunc)
        goal_new = np.zeros((self.B, 2), np.int64)
        agent_new = np.zeros((self.B, 2), np.int64)
        b = int(mask.sum())
        if b:
            g, a = self._sample_spawns(b)
            goal_new[mask] = g
            agent_new[mask] = a
        state = self._apply_reset(
            mid,
            jnp.asarray(mask),
            jnp.asarray(goal_new, jnp.int32),
            jnp.asarray(agent_new, jnp.int32),
        )
        obs = np.asarray(self._observe(state))
        return obs, state, np.asarray(rew), np.asarray(done), np.asarray(trunc)


class CRoomsParityDriver:
    """Steps a batch of :class:`gym_po_tpu.envs.crooms.CRooms` with the
    reference ``CRoomsEnv``'s exact RNG consumption order.

    Mirrored draw order per reference ``gym_po/envs/rooms/crooms.py``:

    * ``reset(seed)`` -> fresh private ``self.rng`` (:246-249,259-263), then
      goal draw, then agent draw (``choice(valid_states, B)`` when random).
    * ``step``: action randomization (:288 -> :175-198):
      'yx' -> ``normal(std, (B,2))``; discrete -> ``random(B)`` failure
      uniforms then, if std, ``normal(std, (B,2))``.  Then wall-hit resample
      ``normal(0.5, (n_oob,2))`` only when any env hit a wall (:317-330).
      Then masked reset draws goal-then-agent for finished envs (:268-274).

    All float work happens in float64 (enable ``jax_enable_x64`` before
    constructing) so trajectories match the reference bit-exactly.
    """

    def __init__(self, env, num_envs: int):
        from ..envs.crooms import CRoomsState

        self.env = env
        self.B = int(num_envs)
        self.rng: np.random.Generator | None = None
        self._CRoomsState = CRoomsState

        self._propose = jax.jit(jax.vmap(env.propose))
        self._resolve = jax.jit(jax.vmap(env.resolve))
        self._apply_reset = jax.jit(jax.vmap(env.apply_reset))
        self._observe = jax.jit(jax.vmap(env.observe))

    def _sample_spawns(self, b: int):
        """goal-then-agent draws (reference crooms.py:216-244,262-263)."""
        from ..envs.crooms import grid_to_coord_np

        env = self.env
        if env.fixed_goal_coord is not None:
            goal = np.broadcast_to(env.fixed_goal_coord, (b, 2)).astype(np.float64)
        else:
            cells = np.array(
                np.unravel_index(
                    self.rng.choice(env.valid_states, b), env.grid_np.shape
                )
            ).swapaxes(0, 1)
            goal = grid_to_coord_np(cells, 1.0)
        if env.fixed_agent_coord is not None:
            agent = np.broadcast_to(env.fixed_agent_coord, (b, 2)).astype(np.float64)
        else:
            cells = np.array(
                np.unravel_index(
                    self.rng.choice(env.valid_states, b), env.grid_np.shape
                )
            ).swapaxes(0, 1)
            agent = grid_to_coord_np(cells, 1.0)
        return goal, agent

    def _effective_actions(self, actions: np.ndarray) -> np.ndarray:
        """Reference crooms.py:171-198,288 on the host in float64."""
        from ..utils.actions import exec_action_np

        env = self.env
        if env.action_type == "yx":
            a = actions + self.rng.normal(scale=env.action_std, size=actions.shape)
        else:
            u = self.rng.random(self.B)
            executed = exec_action_np(env._cum, np.asarray(actions), u)
            a = env._disp_np[executed].astype(np.float64)
            if env.action_std:
                a = a + self.rng.normal(scale=env.action_std, size=a.shape)
        return a * env.action_power

    def reset(self, seed: int):
        self.rng = reference_rng(seed)
        goal, agent = self._sample_spawns(self.B)
        state = self._CRoomsState(
            elapsed=jnp.zeros(self.B, jnp.int32),
            agent_yx=jnp.asarray(agent, jnp.float64),
            goal_yx=jnp.asarray(goal, jnp.float64),
            vel_yx=jnp.zeros((self.B, 2), jnp.float64),
        )
        return np.asarray(self._observe(state)), state

    def step(self, state, actions: np.ndarray):
        a_eff = jnp.asarray(self._effective_actions(np.asarray(actions)))
        proposed, vel_new, oob = self._propose(state, a_eff)
        oob_np = np.asarray(oob)
        noise = np.zeros((self.B, 2), np.float64)
        if oob_np.any():
            noise[oob_np] = self.rng.normal(scale=0.5, size=(int(oob_np.sum()), 2))
        mid, rew, done, trunc = self._resolve(
            state, proposed, vel_new, oob, jnp.asarray(noise)
        )
        mask = np.asarray(done) | np.asarray(trunc)
        goal_new = np.zeros((self.B, 2), np.float64)
        agent_new = np.zeros((self.B, 2), np.float64)
        b = int(mask.sum())
        if b:
            g, a = self._sample_spawns(b)
            goal_new[mask] = g
            agent_new[mask] = a
        state = self._apply_reset(
            mid, jnp.asarray(mask), jnp.asarray(goal_new), jnp.asarray(agent_new)
        )
        obs = np.asarray(self._observe(state))
        return obs, state, np.asarray(rew), np.asarray(done), np.asarray(trunc)


class CarFlagParityDriver:
    """Steps a batch of :class:`gym_po_tpu.envs.car_flag.CarFlag` (or the
    discrete wrapper) with the reference ``CarVecEnv``'s exact RNG order.

    Mirrored draw order per reference ``gym_po/envs/car_flag.py``:

    * ``reset(seed)`` -> gymnasium ``np_random`` seeding, then per reset mask:
      ``uniform(-0.2, 0.2, (b,1))``, ``choice([-1,1], b)`` heavens,
      ``choice([-0.5,0.5], b)`` priests (:97-110).
    * ``step`` draws nothing; the masked reset at the end draws as above
      (:140).

    Run under ``jax_enable_x64`` so the float64 priest comparison and the
    discrete wrapper's float64 force promotion match NumPy bit-exactly.
    """

    def __init__(self, env, num_envs: int):
        from ..envs.car_flag import CarFlagState, PRIEST

        self.env = env
        self.B = int(num_envs)
        self.rng: np.random.Generator | None = None
        self._CarFlagState = CarFlagState
        self._priest = PRIEST

        self._advance = jax.jit(jax.vmap(env.advance))
        self._apply_reset = jax.jit(jax.vmap(env.apply_reset))
        self._observe = jax.jit(jax.vmap(env.observe))

    def _draw_resets(self, b: int):
        pos = self.rng.uniform(-0.2, 0.2, (b, 1))[:, 0]
        heavens = self.rng.choice([-1, 1], b)
        priests = self.rng.choice([-self._priest, self._priest], b)
        return pos, heavens, priests

    def _host_force(self, actions: np.ndarray) -> np.ndarray:
        """Reference force computation: flatten + clip (:116-117); the
        discrete wrapper first maps through float64 linspace (:301-303)."""
        env = self.env
        if hasattr(env, "forces_np"):
            actions = env.forces_np[np.asarray(actions)]
        return np.clip(np.asarray(actions).flatten(), -1.0, 1.0)

    def reset(self, seed: int):
        self.rng = reference_rng(seed)
        pos, heavens, priests = self._draw_resets(self.B)
        state = self._CarFlagState(
            elapsed=jnp.zeros(self.B, jnp.int32),
            pos=jnp.asarray(pos, jnp.float32),
            vel=jnp.zeros(self.B, jnp.float32),
            dirn=jnp.zeros(self.B, jnp.float32),
            heaven=jnp.asarray(heavens, jnp.float32),
            priest=jnp.asarray(priests, jnp.float64),
        )
        return np.asarray(self._observe(state)), state

    def step(self, state, actions: np.ndarray):
        force = jnp.asarray(self._host_force(actions))
        mid, rew, done, trunc = self._advance(state, force)
        mask = np.asarray(done) | np.asarray(trunc)
        pos_new = np.zeros(self.B, np.float64)
        heaven_new = np.zeros(self.B, np.float64)
        priest_new = np.zeros(self.B, np.float64)
        b = int(mask.sum())
        if b:
            p, h, pr = self._draw_resets(b)
            pos_new[mask] = p
            heaven_new[mask] = h
            priest_new[mask] = pr
        state = self._apply_reset(
            mid,
            jnp.asarray(mask),
            jnp.asarray(pos_new),
            jnp.asarray(heaven_new),
            jnp.asarray(priest_new),
        )
        obs = np.asarray(self._observe(state))
        return obs, state, np.asarray(rew), np.asarray(done), np.asarray(trunc)


class MSRoomsParityDriver:
    """Steps a batch of :class:`gym_po_tpu.envs.msrooms.MultistoryFourRooms`
    with the reference ``MultistoryFourRoomsEnv``'s exact RNG order
    (reference msrooms.py, signatures mechanically repaired — see
    ``tests/_reference.py``).

    Draw order: reset -> goal then agent ``choice`` over the floor-filtered
    spawn banks (:378-379); step -> ``random(B)`` failure uniforms (:400),
    then masked reset goal-then-agent (:383-388).
    """

    def __init__(self, env, num_envs: int):
        from ..envs.msrooms import MSRoomsState

        self.env = env
        self.B = int(num_envs)
        self.rng: np.random.Generator | None = None
        self._MSRoomsState = MSRoomsState

        self._advance = jax.jit(jax.vmap(env.advance))
        self._apply_reset = jax.jit(jax.vmap(env.apply_reset))
        self._observe = jax.jit(jax.vmap(env.observe))

    def _sample_spawns(self, b: int):
        env = self.env
        shape = env.grid_np.shape
        if env.fixed_goal_zyx is not None:
            goal = np.broadcast_to(env.fixed_goal_zyx, (b, 3)).copy()
        else:
            goal = np.array(
                np.unravel_index(self.rng.choice(env.valid_goal_states, b), shape)
            ).swapaxes(0, 1)
        if env.fixed_agent_zyx is not None:
            agent = np.broadcast_to(env.fixed_agent_zyx, (b, 3)).copy()
        else:
            agent = np.array(
                np.unravel_index(self.rng.choice(env.valid_agent_states, b), shape)
            ).swapaxes(0, 1)
        return goal, agent

    def reset(self, seed: int):
        self.rng = reference_rng(seed)
        goal, agent = self._sample_spawns(self.B)
        state = self._MSRoomsState(
            elapsed=jnp.zeros(self.B, jnp.int32),
            agent_zyx=jnp.asarray(agent, jnp.int32),
            goal_zyx=jnp.asarray(goal, jnp.int32),
        )
        return np.asarray(self._observe(state)), state

    def step(self, state, actions: np.ndarray):
        from ..utils.actions import exec_action_np

        u = self.rng.random(self.B)
        executed = exec_action_np(self.env._cum, np.asarray(actions), u)
        mid, rew, done, trunc = self._advance(state, jnp.asarray(executed, jnp.int32))
        mask = np.asarray(done) | np.asarray(trunc)
        goal_new = np.zeros((self.B, 3), np.int64)
        agent_new = np.zeros((self.B, 3), np.int64)
        b = int(mask.sum())
        if b:
            g, a = self._sample_spawns(b)
            goal_new[mask] = g
            agent_new[mask] = a
        state = self._apply_reset(
            mid,
            jnp.asarray(mask),
            jnp.asarray(goal_new, jnp.int32),
            jnp.asarray(agent_new, jnp.int32),
        )
        obs = np.asarray(self._observe(state))
        return obs, state, np.asarray(rew), np.asarray(done), np.asarray(trunc)
