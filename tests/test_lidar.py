"""Lidar observation (the reference's declared-but-unimplemented TODO)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt


def test_lidar_space_and_shapes():
    env = gpt.make("CRooms-v0", layout="4", obs_type="lidar", obs_m=8,
                   goal_xy=None)
    assert env.observation_space.shape == (10,)  # 8 rays + relative goal xy
    obs, st = env.reset_vec(jax.random.PRNGKey(0), 8)
    assert obs.shape == (8, 10)
    o = np.asarray(obs)
    assert (o[:, :8] > 0).all() and np.isfinite(o).all()


def test_lidar_geometry():
    """Rays toward an adjacent wall are short; open directions are longer."""
    env = gpt.make("CRooms-v0", layout="4", obs_type="lidar", obs_m=8)
    _, st = env.reset_vec(jax.random.PRNGKey(0), 1)
    # near the NW inner corner: wall one cell to the north and to the west
    st = st.replace(agent_yx=jnp.asarray([[1.5, 1.5]]))
    o = np.asarray(jax.vmap(env.observe)(st))[0]
    rays = o[:8]  # angles 0..2pi, 0 = +y (south)
    north, west = rays[4], rays[6]  # -y and -x directions
    south, east = rays[0], rays[2]
    assert north <= 1.0 + 1e-5 and west <= 1.0 + 1e-5
    assert south > 3 * north and east > 3 * west
    # relative goal offset
    rel = o[8:]
    agent = np.array([1.5, 1.5])
    goal = np.asarray(st.goal_yx)[0]
    np.testing.assert_allclose(rel, goal - agent, rtol=1e-5)


def test_lidar_steps_under_jit():
    env = gpt.make("CRooms-v0", layout="2", obs_type="lidar", obs_m=16,
                   goal_xy=None, use_velocity=True)
    key = jax.random.PRNGKey(1)
    obs, st = env.reset_vec(key, 8)
    assert obs.shape == (8, 18)
    step = jax.jit(env.step_vec)
    for _ in range(20):
        key, ka, ks = jax.random.split(key, 3)
        a = env.action_space.sample_vec(ka, 8)
        obs, st, r, d, tr, _ = step(ks, st, a)
    assert np.isfinite(np.asarray(obs)).all()


def test_lidar_requires_continuous():
    with pytest.raises(NotImplementedError):
        gpt.make("Rooms-v0", layout="4", obs_type="lidar")


def test_velocity_in_obs_flag():
    """'vel' obs flag (reference crooms.py:131 TODO) appends velocity."""
    env = gpt.make("CRooms-v0", layout="4", obs_type="vector_mdp_goal_vel",
                   use_velocity=True, goal_xy=None)
    assert env.observation_space.shape == (6,)
    key = jax.random.PRNGKey(0)
    obs, st = env.reset_vec(key, 8)
    step = jax.jit(env.step_vec)
    for _ in range(10):
        key, ka, ks = jax.random.split(key, 3)
        a = env.action_space.sample_vec(ka, 8)
        obs, st, r, d, tr, _ = step(ks, st, a)
    np.testing.assert_allclose(
        np.asarray(obs)[:, 4:], np.asarray(st.vel_yx), rtol=1e-6
    )
    # discrete base obs rejects the flag
    with pytest.raises(NotImplementedError):
        gpt.make("CRooms-v0", layout="4", obs_type="mdp_vel")
