"""RockSample(n,k): canonical-POMDP semantics (the reference is a stub, so
these are semantic/invariant tests against Smith & Simmons 2004, not parity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.envs.rocksample import (
    OBS_BAD,
    OBS_GOOD,
    OBS_NULL,
    RockSample,
    A_EAST,
    A_SAMPLE,
)


def _mk(**kw):
    kw.setdefault("map_size", (5, 5))
    kw.setdefault("num_rocks", 3)
    kw.setdefault("rock_positions", [[0, 0], [2, 2], [4, 4]])
    kw.setdefault("init_pos", (2, 2))
    return RockSample(**kw)


def test_spaces():
    env = _mk()
    assert env.action_space.n == 5 + 3
    assert env.observation_space.n == 5 * 5 * 3 + 3
    venv = _mk(obs_type="vector")
    assert venv.observation_space.shape == (3,)


def test_exit_east_terminates_with_reward():
    env = _mk(init_pos=(2, 4))
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    obs, ns, rew, done, trunc, info = env.step(key, state, jnp.int32(A_EAST))
    assert bool(done) and float(rew) == 10.0
    # autoreset put the rover back at init
    assert np.asarray(ns.pos_yx).tolist() == [2, 4]


def test_sample_on_good_rock_then_rock_is_bad():
    env = _mk()
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    state = state.replace(rock_good=jnp.array([True, True, True]))
    # rover starts on rock (2,2) = rock index 1
    mid, rew, done, trunc = env.advance(
        state, jnp.int32(A_SAMPLE), jnp.float32(0.5)
    )
    assert float(rew) == 10.0 and not bool(done)
    assert np.asarray(mid.rock_good).tolist() == [True, False, True]
    # sampling again: now bad
    mid2, rew2, *_ = env.advance(mid, jnp.int32(A_SAMPLE), jnp.float32(0.5))
    assert float(rew2) == -10.0


def test_sample_off_rock_penalty():
    env = _mk(init_pos=(1, 1))  # not a rock
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    mid, rew, *_ = env.advance(state, jnp.int32(A_SAMPLE), jnp.float32(0.5))
    assert float(rew) == -100.0


def test_check_is_exact_at_distance_zero():
    env = _mk()
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    state = state.replace(rock_good=jnp.array([False, True, False]))
    # CHECK rock 1 while standing on it: eta = 1, any u < 1 is correct
    for u in (0.0, 0.5, 0.999):
        mid, *_ = env.advance(state, jnp.int32(5 + 1), jnp.float32(u))
        assert int(mid.reading) == OBS_GOOD
    state = state.replace(rock_good=jnp.array([False, False, False]))
    mid, *_ = env.advance(state, jnp.int32(5 + 1), jnp.float32(0.3))
    assert int(mid.reading) == OBS_BAD


def test_check_noise_rate_matches_eta():
    """At distance d, accuracy must be 0.5*(1+2^(-d/d0))."""
    env = _mk(init_pos=(0, 0), half_efficiency_distance=4.0)
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    state = state.replace(rock_good=jnp.array([True, True, True]))
    # rock 2 at (4,4): d = sqrt(32); eta = 0.5*(1+2^(-d/4))
    d = np.sqrt(32.0)
    eta = 0.5 * (1 + 2 ** (-d / 4.0))
    us = np.random.default_rng(0).uniform(size=4000).astype(np.float32)
    adv = jax.jit(jax.vmap(lambda u: env.advance(state, jnp.int32(5 + 2), u)))
    mid, *_ = adv(jnp.asarray(us))
    rate = (np.asarray(mid.reading) == OBS_GOOD).mean()
    assert abs(rate - eta) < 0.02, (rate, eta)


def test_null_reading_unless_check():
    env = _mk()
    key = jax.random.PRNGKey(1)
    _, state = env.reset(key)
    mid, *_ = env.advance(state, jnp.int32(0), jnp.float32(0.5))
    assert int(mid.reading) == OBS_NULL


def test_registry_and_batch_rollout():
    env = gpt.make("RockSample-v0", map_size=(7, 7), num_rocks=8)
    B = 16
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, B))
    step = jax.jit(jax.vmap(env.step))
    for _ in range(60):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.randint(ka, (B,), 0, env.num_actions)
        obs, state, r, d, tr, _ = step(jax.random.split(ks, B), state, a)
    pos = np.asarray(state.pos_yx)
    assert (pos >= 0).all() and (pos[:, 0] < 7).all() and (pos[:, 1] < 7).all()
    o = np.asarray(obs)
    assert (o >= 0).all() and (o < env.observation_space.n).all()
