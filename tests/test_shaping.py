"""Potential-based shaping wrapper (envs/shaping.py).

The wrapper must add EXACTLY F = γΦ(s_mid)·(1−done) − Φ(s_prev) to the raw
reward (s_mid = the pre-reset successor), pass everything else through, and
leave the learners' pos/neg terminal-rate metrics unpolluted (they count
|reward| ≥ 0.5 only).
"""

import numpy as np

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.envs.ant_physics import AntHeavenHellPhysicsState
from gym_po_tpu.envs.shaping import (
    PotentialShaped,
    heaven_hell_potential,
    tag_potential,
)


def test_shaped_reward_is_raw_plus_exact_pbrs_term():
    raw = gpt.make("HeavenHellContinuous-v0")
    phi = heaven_hell_potential(0.1)
    env = PotentialShaped(raw, phi, gamma=0.99)
    B = 64
    key = jax.random.PRNGKey(0)
    obs, state = env.reset_vec(jax.random.PRNGKey(1), B)
    for t in range(5):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.uniform(ka, (B, 2), jnp.float32, -1, 1)
        ro, rstate, rrew, rdone, rtr, rinfo = raw.step_vec(ks, state, a)
        so, sstate, srew, sdone, strr, sinfo = env.step_vec(ks, state, a)
        f = (0.99 * phi(rinfo["terminal_state"])
             * (1.0 - rdone.astype(jnp.float32)) - phi(state))
        np.testing.assert_allclose(
            np.asarray(srew), np.asarray(rrew + f), rtol=1e-6, atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(so), np.asarray(ro))
        np.testing.assert_array_equal(np.asarray(sdone), np.asarray(rdone))
        state = sstate

    assert env.observation_space.shape == raw.observation_space.shape
    assert env.action_space.shape == raw.action_space.shape


def test_shaping_increments_stay_below_terminal_threshold():
    """|F| must stay well under the 0.5 pos/neg-rate metric threshold, so
    shaped runs report real heaven/hell arrivals only."""
    raw = gpt.make("HeavenHellContinuous-v0")
    env = PotentialShaped(raw, heaven_hell_potential(0.1), gamma=0.99)
    B = 256
    key = jax.random.PRNGKey(2)
    obs, state = env.reset_vec(jax.random.PRNGKey(3), B)
    for _ in range(20):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.uniform(ka, (B, 2), jnp.float32, -1, 1)
        obs, state, rew, done, trunc, _ = env.step_vec(ks, state, a)
        r = np.asarray(rew)
        nonterm = ~np.asarray(done)
        # non-terminal steps carry only the shaping increment
        assert np.abs(r[nonterm]).max() < 0.3


def test_heaven_hell_potential_on_ant_state():
    """The same potential reads the articulated state (qpos[..., :2])."""
    phi = heaven_hell_potential(0.1)
    qpos = jnp.zeros((4, 15)).at[:, :2].set(
        jnp.asarray([[0.0, 0.0], [6.25, 6.0], [-6.25, 6.0], [0.0, 6.0]])
    )
    st = AntHeavenHellPhysicsState(
        elapsed=jnp.zeros(4, jnp.int32),
        qpos=qpos,
        qvel=jnp.zeros((4, 14)),
        warm=jnp.zeros((4, 14)),
        heaven_right=jnp.asarray([True, True, True, False]),
    )
    v = np.asarray(phi(st))
    # at heaven the geodesic is zero; at the wrong side it is maximal
    np.testing.assert_allclose(v[1], 0.0, atol=1e-6)
    assert v[0] < v[3] < v[1]  # spawn < priest < heaven (monotone progress)
    np.testing.assert_allclose(v[2], -0.1 * 12.5, atol=1e-5)  # hell side


def test_tag_potential_tracks_target_distance():
    phi = tag_potential(0.2)
    st = gpt.make("TagContinuous-v0")
    obs, state = st.reset_vec(jax.random.PRNGKey(0), 8)
    d = np.sqrt(
        ((np.asarray(state.agent_xy) - np.asarray(state.target_xy)) ** 2
         ).sum(-1))
    np.testing.assert_allclose(np.asarray(phi(state)), -0.2 * d, rtol=1e-4)
