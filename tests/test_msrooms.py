"""Multistory FourRooms: bit-exact parity vs (repaired) reference + invariants.

The shipped reference msrooms.py NameErrors at runtime (mangled annotations,
SURVEY.md §2.3 O6); ``tests/_reference.py`` mechanically de-mangles it so it
can serve as the oracle.
"""

import numpy as np
import pytest

import jax

from gym_po_tpu.envs.msrooms import MultistoryFourRooms
from gym_po_tpu.compat.parity import MSRoomsParityDriver

from _reference import load_reference_module


def _run_parity(seed, B=16, T=220, **kw):
    ref = load_reference_module("gym_po.envs.rooms.msrooms")
    renv = ref.MultistoryFourRoomsEnv(B, **kw)
    env = MultistoryFourRooms(**kw)
    drv = MSRoomsParityDriver(env, B)

    ref_obs, _ = renv.reset(seed=seed)
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
    "kw",
    [
        {"grid_z": 1, "obs_type": "mdp"},
        {"grid_z": 3, "obs_type": "mdp", "goal_xyz": None},
        {"grid_z": 2, "obs_type": "hansen"},
        {"grid_z": 2, "obs_type": "hansen8", "action_type": "ordinal"},
        {"grid_z": 3, "obs_type": "vector_mdp_goal"},
        {"grid_z": 2, "obs_type": "vector_hansen_goal", "time_limit": 60},
        # NOTE: fixed agent_xyz is untestable against the reference — its
        # fixed-agent path crashes (msrooms.py:356 indexes the 3-D grid with
        # a 1-D np.array -> fancy-indexes the z axis). We fix it; see below.
        {"grid_z": 1, "obs_type": "mdp_goal", "goal_xyz": None},
    ],
)
def test_parity_vs_reference(kw):
    _run_parity(seed=5, **kw)


def test_parity_truncation_boundary():
    _run_parity(seed=1, B=8, T=130, grid_z=2, obs_type="mdp",
                time_limit=120)


def test_fixed_agent_spawn():
    """agent_xyz works here although the reference's equivalent path crashes."""
    env = MultistoryFourRooms(grid_z=2, obs_type="vector_mdp",
                              agent_xyz=(2, 3, 0))
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    assert np.asarray(state.agent_zyx).tolist() == [0, 3, 2]
    # invalid (wall) coordinate falls back to START_XYZ=(1,1,0)
    env2 = MultistoryFourRooms(grid_z=2, obs_type="vector_mdp",
                               agent_xyz=(0, 0, 0))
    _, s2 = env2.reset(key)
    assert np.asarray(s2.agent_zyx).tolist() == [0, 1, 1]


def test_stair_transit_teleports():
    """Climbing stairs moves the agent between floors at the right cells
    (reference msrooms.py:419-428: stair_up NE -> next floor SW, stair_down
    SW -> previous floor NE)."""
    env = MultistoryFourRooms(grid_z=2, obs_type="vector_mdp",
                              agent_xyz=(11, 2, 0), goal_xyz=None)
    # place agent just below the NE stair_up at (z=0, y=1, x=11)
    key = jax.random.PRNGKey(0)
    _, state = env.reset(key)
    state = state.replace(agent_zyx=jax.numpy.asarray([0, 2, 11]))
    # move north (cardinal action 0 = N per ACTIONS_CARDINAL_Z)
    mid, rew, done, trunc = env.advance(state, jax.numpy.int32(0))
    z, y, x = np.asarray(mid.agent_zyx).tolist()
    assert z == 1 and (y, x) == (11, 1)  # teleported to SW of floor 1


def test_perf_mode_invariants():
    env = MultistoryFourRooms(grid_z=3, obs_type="hansen", goal_xyz=None)
    B = 32
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, B))
    step = jax.jit(jax.vmap(env.step))
    grid = env.grid_np
    for _ in range(100):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.randint(ka, (B,), 0, env.num_actions)
        obs, state, r, d, tr, info = step(jax.random.split(ks, B), state, a)
        azyx = np.asarray(state.agent_zyx)
        assert (grid[azyx[:, 0], azyx[:, 1], azyx[:, 2]] != 0).all()
        gzyx = np.asarray(state.goal_zyx)
        # goal always on the top floor (reference msrooms.py:318-321)
        assert (gzyx[:, 0] == grid.shape[0] - 1).all()
