"""CRooms: bit-exact parity vs reference + perf-mode invariants."""

import numpy as np
import pytest

import jax

from gym_po_tpu.envs.crooms import CRooms
from gym_po_tpu.compat.parity import CRoomsParityDriver

from _reference import load_reference_module


def _run_parity(layout, obs_type, seed, B=8, T=130, **kw):
    ref = load_reference_module("gym_po.envs.rooms.crooms")
    renv = ref.CRoomsEnv(B, layout=layout, obs_type=obs_type, **kw)
    env = CRooms(layout=layout, obs_type=obs_type, **kw)
    drv = CRoomsParityDriver(env, B)

    ref_obs = renv.reset(seed=seed)  # reference returns bare obs
    obs, state = drv.reset(seed)
    np.testing.assert_array_equal(np.asarray(ref_obs), obs)

    arng = np.random.default_rng(seed + 1)
    for t in range(T):
        if env.action_type == "yx":
            actions = arng.uniform(-1, 1, (B, 2))
        else:
            actions = arng.integers(0, env.num_actions, B)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        np.testing.assert_array_equal(np.asarray(ro), o, err_msg=f"obs t={t}")
        np.testing.assert_array_equal(np.asarray(rr), r, err_msg=f"rew t={t}")
        assert (np.asarray(rd) == d).all() and (np.asarray(rt) == tr).all(), t


@pytest.mark.usefixtures("x64")
@pytest.mark.parametrize(
    "layout,obs_type,kw",
    [
        ("4", "vector_mdp_goal", {"time_limit": 60}),
        ("4", "mdp", {"time_limit": 60, "action_type": "cardinal"}),
        ("2", "hansen", {"time_limit": 60, "action_type": "ordinal",
                         "action_std": 0.0}),
        ("4b", "vector_hansen_goal", {"time_limit": 60, "goal_xy": None}),
        ("8", "room_goal", {"time_limit": 60, "use_velocity": True}),
        ("4", "grid", {"obs_m": 5, "time_limit": 60, "cell_size": 2.0}),
    ],
)
def test_parity_vs_reference(layout, obs_type, kw):
    _run_parity(layout, obs_type, seed=11, **kw)


@pytest.mark.usefixtures("x64")
def test_parity_velocity_truncation():
    # velocity dynamics + crossing the truncation boundary
    _run_parity("4", "vector_mdp", seed=3, B=4, T=90,
                time_limit=40, use_velocity=True)


def test_perf_mode_invariants():
    env = CRooms(layout="4", obs_type="vector_mdp_goal", goal_xy=None,
                 time_limit=50)
    B = 16
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, B))
    step = jax.jit(jax.vmap(env.step))
    grid = env.grid_np
    H, W = grid.shape
    for _ in range(60):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.uniform(ka, (B, 2), minval=-1, maxval=1)
        obs, state, r, d, tr, info = step(jax.random.split(ks, B), state, a)
    pos = np.asarray(state.agent_yx)
    assert (pos >= 0).all() and (pos[:, 0] < H).all() and (pos[:, 1] < W).all()
    cells = np.floor(pos).astype(int)
    # agent never rests inside a wall
    assert (grid[cells[:, 0], cells[:, 1]] >= 0).all()
    vel = np.asarray(state.vel_yx)
    assert (vel == 0).all()  # use_velocity=False keeps velocity zero
