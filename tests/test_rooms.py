"""Rooms: layout compilation, obs models, and bit-exact parity vs reference."""

import numpy as np
import pytest

import jax

from gym_po_tpu.envs.rooms import Rooms
from gym_po_tpu.compat.parity import RoomsParityDriver
from gym_po_tpu.maps.layouts import LAYOUT_NAMES, layout_grid

from _reference import load_reference_module


@pytest.mark.parametrize("name", LAYOUT_NAMES)
def test_layout_grids_match_reference(name):
    ref = load_reference_module("gym_po.envs.rooms.layouts")
    rg = ref.np_to_grid(ref.layout_to_np(ref.LAYOUTS[name]))
    assert (layout_grid(name) == rg).all()


def _run_parity(layout, obs_type, seed, B=16, T=520, **kw):
    ref = load_reference_module("gym_po.envs.rooms.rooms")
    renv = ref.RoomsEnv(B, layout=layout, obs_type=obs_type, **kw)
    env = Rooms(layout=layout, obs_type=obs_type, **kw)
    drv = RoomsParityDriver(env, B)

    ref_obs = renv.reset(seed=seed)  # reference returns bare obs (API quirk)
    obs, state = drv.reset(seed)
    np.testing.assert_array_equal(np.asarray(ref_obs), obs)

    arng = np.random.default_rng(seed + 1)
    A = env.num_actions
    for t in range(T):
        actions = arng.integers(0, A, B)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        assert (np.asarray(ro) == o).all(), f"obs mismatch at t={t}"
        assert (np.asarray(rr) == r).all(), f"reward mismatch at t={t}"
        assert (np.asarray(rd) == d).all() and (np.asarray(rt) == tr).all(), t


@pytest.mark.parametrize(
    "layout,obs_type,kw",
    [
        ("4", "mdp", {}),
        ("4", "hansen", {"action_type": "cardinal"}),
        ("2", "hansen8", {}),
        ("4", "grid", {"obs_n": 5}),
        ("8", "room_goal", {"goal_xy": None}),
        ("4b", "vector_hansen_goal", {}),
        # NOTE: fixed agent_xy is untestable against the reference — its
        # fixed-agent path crashes (rooms.py:164-166 indexes grid with an
        # np.array -> ambiguous truth value). We fix it; see test below.
        ("10", "vector_mdp_goal", {}),
        ("16", "mdp_goal", {"goal_xy": None, "time_limit": 50}),
    ],
)
def test_parity_vs_reference(layout, obs_type, kw):
    _run_parity(layout, obs_type, seed=7, T=220, **kw)


def test_parity_long_horizon_truncation():
    # crosses the 500-step truncation boundary
    _run_parity("4", "mdp", seed=0, B=8, T=520)


def test_fixed_agent_spawn():
    """agent_xy works here although the reference's equivalent path crashes."""
    env = Rooms(layout="4", obs_type="vector_mdp", agent_xy=(1, 1))
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    assert np.asarray(state.agent_yx).tolist() == [1, 1]
    # invalid fixed coordinate falls back to layout START
    env2 = Rooms(layout="4", obs_type="vector_mdp", agent_xy=(0, 0))
    _, s2 = env2.reset(key)
    assert np.asarray(s2.agent_yx).tolist() == [1, 1]


def test_perf_mode_invariants():
    env = Rooms(layout="4", obs_type="hansen", goal_xy=None)
    B = 32
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, B))
    step = jax.jit(jax.vmap(env.step))
    grid = env.grid_np
    for _ in range(100):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.randint(ka, (B,), 0, env.num_actions)
        obs, state, r, d, tr, info = step(jax.random.split(ks, B), state, a)
        ayx = np.asarray(state.agent_yx)
        # agent never inside a wall
        assert (grid[ayx[:, 0], ayx[:, 1]] >= 0).all()
        gyx = np.asarray(state.goal_yx)
        assert (grid[gyx[:, 0], gyx[:, 1]] >= 0).all()
