"""Pure-JAX tag / heaven-hell task re-expressions (point-mass surrogates)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.envs.tag_jax import (
    CAGE,
    HH_SITES,
    HeavenHellContinuous,
    TAG_RADIUS,
    TagContinuous,
    VISIBLE_RADIUS,
)


def test_tag_spawn_contract():
    env = gpt.make("TagContinuous-v0")
    obs, st = env.reset_vec(jax.random.PRNGKey(0), 512)
    a = np.asarray(st.agent_xy)
    t = np.asarray(st.target_xy)
    assert (np.abs(a) <= CAGE).all() and (np.abs(t) <= CAGE).all()
    d = np.linalg.norm(a - t, axis=-1)
    assert (d >= 5.0).all()  # reference min spawn distance
    # target invisible at spawn -> obs tail zeros, flag 0
    o = np.asarray(obs)
    assert (o[:, 2:4] == 0).all() and (o[:, 4] == 0).all()


def test_tag_visibility_and_termination():
    env = TagContinuous()
    key = jax.random.PRNGKey(1)
    _, st = env.reset(key)
    # place the target just inside the visible radius
    st = st.replace(
        agent_xy=jnp.asarray([0.0, 0.0]),
        target_xy=jnp.asarray([2.0, 0.0]),
    )
    o = np.asarray(env.observe(st))
    assert o[4] == 1.0 and o[2] == 2.0
    # chase: move straight at the target; it flees at most 0.5/step while
    # the agent closes 0.25 -> with the target cornered, tag happens
    st = st.replace(target_xy=jnp.asarray([4.4, 0.0]))
    done_seen = False
    for t in range(60):
        key, ks = jax.random.split(key)
        d = st.target_xy - st.agent_xy
        a = d / jnp.maximum(jnp.sqrt((d * d).sum()), 1e-6)
        obs, st, r, done, trunc, _ = env.step(ks, st, a)
        if bool(done):
            assert float(r) == 1.0
            done_seen = True
            break
    assert done_seen


def test_heavenhell_priest_and_terminals():
    env = HeavenHellContinuous()
    key = jax.random.PRNGKey(0)
    _, st = env.reset(key)
    # at the priest: direction revealed
    stp = st.replace(agent_xy=jnp.asarray(HH_SITES[2]))
    o = np.asarray(env.observe(stp))
    assert o[2] == (1.0 if bool(stp.heaven_right) else -1.0)
    # away from the priest: hidden
    assert np.asarray(env.observe(st))[2] == 0.0
    # walk into heaven: +1 terminal
    heaven = HH_SITES[1] if bool(st.heaven_right) else HH_SITES[0]
    st2 = st.replace(agent_xy=jnp.asarray(heaven) + jnp.asarray([1.0, 0.0]))
    obs, ns, r, done, trunc, _ = env.step(key, st2, jnp.zeros(2))
    assert bool(done) and float(r) == 1.0
    # walk into hell: -1 terminal
    hell = HH_SITES[0] if bool(st.heaven_right) else HH_SITES[1]
    st3 = st.replace(agent_xy=jnp.asarray(hell) + jnp.asarray([1.0, 0.0]))
    obs, ns, r, done, trunc, _ = env.step(key, st3, jnp.zeros(2))
    assert bool(done) and float(r) == -1.0


def test_heavenhell_walls_confine():
    env = gpt.make("HeavenHellContinuous-v0", time_limit=300)
    key = jax.random.PRNGKey(2)
    obs, st = env.reset_vec(key, 64)
    step = jax.jit(env.step_vec)
    for _ in range(200):
        key, ka, ks = jax.random.split(key, 3)
        a = env.action_space.sample_vec(ka, 64)
        obs, st, r, d, tr, _ = step(ks, st, a)
    xy = np.asarray(st.agent_xy)
    in_stem = (np.abs(xy[:, 0]) <= 2.0) & (xy[:, 1] >= -1.5) & (xy[:, 1] <= 4.5)
    in_bar = (np.abs(xy[:, 0]) <= 8.0) & (xy[:, 1] >= 4.0) & (xy[:, 1] <= 8.0)
    assert (in_stem | in_bar).all()


def test_tag_jax_learns_with_ppo():
    """PPO should learn to tag far faster than random (task sanity)."""
    from gym_po_tpu.agents import PPOConfig, init_train_state, make_train_step

    env = gpt.make("TagContinuous-v0", time_limit=100)
    cfg = PPOConfig(num_envs=64, rollout_steps=64, epochs=2, minibatches=2,
                    learning_rate=1e-3, hidden=(32, 32))
    net, ts = init_train_state(env, cfg, jax.random.PRNGKey(0))
    step = make_train_step(env, net, cfg)
    rewards = []
    for _ in range(20):
        ts, m = step(ts)
        rewards.append(float(m["mean_reward"]))
    assert np.isfinite(rewards).all()


def test_visible_radius_kwarg():
    """`visible_radius` (reference default 3.0, ant_tag.py:77-86) controls
    the visibility cutoff — the memory-pays knob (BASELINE.md)."""
    import gym_po_tpu as gpt
    from gym_po_tpu.envs.tag_jax import TagState

    st = TagState(
        elapsed=jnp.zeros((), jnp.int32),
        agent_xy=jnp.asarray([0.0, 0.0], jnp.float32),
        target_xy=jnp.asarray([2.0, 0.0], jnp.float32),
    )
    e3 = gpt.make("TagContinuous-v0", visible_radius=3.0)
    e1 = gpt.make("TagContinuous-v0", visible_radius=1.0)
    assert float(e3.observe(st)[4]) == 1.0  # visible at the reference radius
    assert float(e1.observe(st)[4]) == 0.0  # hidden when the cutoff shrinks
    np.testing.assert_allclose(np.asarray(e1.observe(st)[2:4]), 0.0)
