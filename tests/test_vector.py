"""vector/ layer: VecEnv batching, scan rollout, episode statistics.

Also the jit/vmap consistency tests from SURVEY.md §4 item 4: un-jitted vs
jitted vs vmapped single-env outputs must be identical.
"""

import numpy as np

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.vector import (
    RecordEpisodeStatistics,
    VecEnv,
    rollout,
)


def test_vecenv_spaces_and_step():
    env = gpt.make("Taxi-v4")
    venv = VecEnv(env, 8)
    assert venv.num_envs == 8 and venv.is_vector_env
    assert venv.single_action_space.n == env.action_space.n
    assert venv.observation_space.shape == (8,)
    key = jax.random.PRNGKey(0)
    obs, state = venv.reset(key)
    assert obs.shape == (8,)
    a = jnp.zeros(8, jnp.int32)
    obs2, state2, r, d, tr, info = venv.step(key, state, a)
    assert obs2.shape == r.shape == d.shape == (8,)


def test_jit_vmap_consistency():
    """un-jitted == jitted == vmapped-with-B=1 (SURVEY.md §4 item 4)."""
    env = gpt.make("HansenTaxi-v4")
    key = jax.random.PRNGKey(3)
    obs_e, st_e = env.reset(key)
    obs_j, st_j = jax.jit(env.reset)(key)
    obs_v, st_v = jax.vmap(env.reset)(key[None])
    assert np.asarray(obs_e) == np.asarray(obs_j) == np.asarray(obs_v)[0]

    k2 = jax.random.PRNGKey(5)
    a = jnp.int32(1)
    out_e = env.step(k2, st_e, a)
    out_j = jax.jit(env.step)(k2, st_j, a)
    out_v = jax.vmap(env.step)(k2[None], jax.tree.map(lambda x: x[None], st_e), a[None])
    for i in (0, 2, 3, 4):  # obs, reward, done, truncated (1 is the state pytree)
        e, j, v = out_e[i], out_j[i], out_v[i]
        assert np.asarray(e) == np.asarray(j) == np.asarray(v)[0]


def test_rollout_shapes_and_continuation():
    env = gpt.make("Taxi-v4")
    key = jax.random.PRNGKey(0)
    traj, final = jax.jit(lambda k: rollout(env, k, None, 16, 32))(key)
    assert traj.obs.shape == (32, 16)
    assert traj.reward.shape == traj.done.shape == (32, 16)
    # continuing from `final` keeps stepping the same episodes
    traj2, _ = jax.jit(lambda k, i: rollout(env, k, None, 16, 8, init=i))(
        jax.random.PRNGKey(1), final
    )
    assert traj2.obs.shape == (8, 16)
    # first obs of continuation == final obs of first rollout
    np.testing.assert_array_equal(np.asarray(traj2.obs[0]), np.asarray(final[0]))


def test_rollout_policy_is_used():
    env = gpt.make("Taxi-v4")

    def always_noop(key, obs):
        return jnp.full(obs.shape[0], 5, jnp.int32)  # action 5 = no-op

    traj, _ = rollout(env, jax.random.PRNGKey(0), always_noop, 4, 10)
    assert (np.asarray(traj.action) == 5).all()


def test_episode_statistics_accumulate():
    env = RecordEpisodeStatistics(gpt.make("CarFlag-v0", time_limit=20))
    key = jax.random.PRNGKey(0)
    traj, (obs, state) = jax.jit(
        lambda k: rollout(env, k, None, 8, 64, keep_infos=True)
    )(key)
    fin = np.asarray(traj.info["episode_done"])
    assert fin.any(), "20-step truncation must fire within 64 steps"
    lengths = np.asarray(traj.info["episode_length"])
    # once an episode finished, its recorded length is positive and <= 20
    t, b = np.nonzero(fin)
    assert (lengths[t, b] > 0).all() and (lengths[t, b] <= 20).all()
    # running counters reset to 0 on finish
    running = np.asarray(state.episode_length)
    assert (running >= 0).all() and (running <= 20).all()


def test_episode_return_matches_manual_sum():
    env = RecordEpisodeStatistics(gpt.make("Rooms-v0", time_limit=15))
    key = jax.random.PRNGKey(2)
    traj, _ = jax.jit(lambda k: rollout(env, k, None, 4, 40, keep_infos=True))(key)
    rew = np.asarray(traj.reward)
    fin = np.asarray(traj.info["episode_done"])
    rets = np.asarray(traj.info["episode_return"])
    B = rew.shape[1]
    for b in range(B):
        start = 0
        for t in range(rew.shape[0]):
            if fin[t, b]:
                expected = rew[start : t + 1, b].sum()
                np.testing.assert_allclose(rets[t, b], expected, rtol=1e-6)
                start = t + 1
