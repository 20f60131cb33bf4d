"""Perf-mode draw distributions match the reference's (statistically).

Parity tests prove bit-exactness when feeding mirrored draws; these prove
the in-graph ``jax.random`` replacements draw from the SAME distributions
(SURVEY.md §2.5 RNG row: "identical distributions").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.utils.actions import failure_matrix, make_exec_action


def test_exec_action_matches_failure_matrix():
    """Empirical executed-action frequencies == failure-matrix rows."""
    A, p = 8, 0.2
    fm = failure_matrix(A, p)
    exec_fn = make_exec_action(fm.cumsum(axis=1))
    N = 200_000
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (N,))
    for cmd in (0, 3, 7):
        executed = np.asarray(
            exec_fn(jnp.full((N,), cmd, jnp.int32), u)
        )
        freq = np.bincount(executed, minlength=A) / N
        np.testing.assert_allclose(freq, fm[cmd], atol=0.005)


def test_taxi_task_reset_destination_never_equals_passenger():
    """The rejection-free d = d0 + (d0 >= p) trick: d uniform over != p."""
    env = gpt.make("Taxi-v4")
    N = 100_000
    kp, kd = jax.random.split(jax.random.PRNGKey(1))
    p = jax.random.randint(kp, (N,), 0, env.nlocs)
    d0 = jax.random.randint(kd, (N,), 0, env.nlocs - 1)
    d = np.asarray(d0 + (d0 >= p))
    p = np.asarray(p)
    assert (d != p).all()
    # conditional uniformity: for each p, d uniform over the other 3
    for pv in range(env.nlocs):
        sel = d[p == pv]
        freq = np.bincount(sel, minlength=env.nlocs) / sel.size
        expected = np.full(env.nlocs, 1 / (env.nlocs - 1))
        expected[pv] = 0.0
        np.testing.assert_allclose(freq, expected, atol=0.01)


def test_rooms_reset_uniform_over_valid_cells():
    env = gpt.make("Rooms-v0", layout="4", goal_xy=None)
    _, state = env.reset_vec(jax.random.PRNGKey(2), 200_000)
    ayx = np.asarray(state.agent_yx)
    GW = env.grid_np.shape[1]
    flat = ayx[:, 0] * GW + ayx[:, 1]
    valid = env.valid_states
    counts = np.bincount(flat, minlength=env.grid_np.size)[valid]
    assert counts.min() > 0
    # chi-square-ish: all counts within 5 sigma of the uniform expectation
    exp = flat.size / valid.size
    assert (np.abs(counts - exp) < 5 * np.sqrt(exp)).all()


def test_crooms_action_noise_std():
    """Effective-action noise has the configured std (perf mode)."""
    env = gpt.make("CRooms-v0", layout="4", action_std=0.2, action_power=1.0)
    B = 100_000
    a = jnp.zeros((B, 2), jnp.float32)
    eff = np.asarray(env._sample_effective_vec(jax.random.PRNGKey(3), a))
    assert abs(eff.mean()) < 0.005
    np.testing.assert_allclose(eff.std(), 0.2, atol=0.005)


def test_carflag_reset_marginals():
    env = gpt.make("CarFlag-v0")
    _, st = env.reset_vec(jax.random.PRNGKey(4), 100_000)
    pos = np.asarray(st.pos)
    assert (np.abs(pos) <= 0.2).all()
    np.testing.assert_allclose(pos.mean(), 0.0, atol=0.005)
    hv = np.asarray(st.heaven)
    np.testing.assert_allclose((hv == 1).mean(), 0.5, atol=0.01)
    pr = np.asarray(st.priest)
    np.testing.assert_allclose((pr == 0.5).mean(), 0.5, atol=0.01)


def test_rocksample_rock_quality_coinflip():
    env = gpt.make("RockSample-v0", num_rocks=8)
    _, st = env.reset_vec(jax.random.PRNGKey(5), 50_000)
    good = np.asarray(st.rock_good)
    np.testing.assert_allclose(good.mean(axis=0), 0.5, atol=0.02)


@pytest.mark.parametrize(
    "name,kws",
    [
        ("Taxi-v4", [{"num_passengers": 3}, {"time_limit": 13},
                     {"reward_goal": 5.0, "reward_bad": -2.0}]),
        ("Rooms-v0", [{"layout": "1"}, {"layout": "32b", "obs_type": "hansen8"},
                      {"action_type": "cardinal", "obs_type": "grid", "obs_n": 7},
                      {"obs_type": "room_goal", "goal_xy": None}]),
        ("CRooms-v0", [{"cell_size": 3.0, "obs_type": "grid", "obs_m": 3},
                       {"action_type": "ordinal", "action_std": 0.0},
                       {"use_velocity": True, "obs_type": "vector_mdp_goal"}]),
        ("MultistoryFourRooms-v0", [{"grid_z": 5}, {"action_type": "ordinal",
                                                     "obs_type": "hansen8"}]),
        ("DiscreteCarFlag-v0", [{"num_actions": 2}, {"num_actions": 9}]),
        ("RockSample-v0", [{"map_size": (5, 5), "num_rocks": 3},
                           {"obs_type": "vector", "half_efficiency_distance": 2.0}]),
    ],
)
def test_constructor_fuzz(name, kws):
    """Every documented kwarg combination constructs and steps cleanly."""
    for kw in kws:
        env = gpt.make(name, **kw)
        key = jax.random.PRNGKey(0)
        obs, state = env.reset_vec(key, 8)
        step = jax.jit(env.step_vec)
        for t in range(5):
            key, ka, ks = jax.random.split(key, 3)
            a = env.action_space.sample_vec(ka, 8)
            obs, state, r, d, tr, _ = step(ks, state, a)
        assert np.isfinite(np.asarray(r, dtype=np.float32)).all()
