"""Pallas fused rooms rollout: semantic checks (TPU interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.ops import make_fused_rooms_rollout


def _init(env, B):
    key = jax.random.PRNGKey(0)
    _, st = env.reset_vec(key, B)
    GW = env.grid_np.shape[1]
    a0 = (st.agent_yx[:, 0] * GW + st.agent_yx[:, 1]).reshape(-1, 128)
    g0 = (st.goal_yx[:, 0] * GW + st.goal_yx[:, 1]).reshape(-1, 128)
    return a0.astype(jnp.int32), g0.astype(jnp.int32)


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
@pytest.mark.parametrize("layout", ["4", "16"])
def test_fused_rooms_validity(layout):
    env = gpt.make("Rooms-v0", layout=layout, obs_type="mdp", goal_xy=None)
    B, K = 256, 32
    run = make_fused_rooms_rollout(env, B, K, interpret=True)
    a0, g0 = _init(env, B)
    a, g, rew = run(jnp.asarray([3], jnp.int32), a0, g0)
    walls = env.grid_np.reshape(-1) == -1
    assert not walls[np.asarray(a).reshape(-1)].any()
    assert not walls[np.asarray(g).reshape(-1)].any()
    assert np.isfinite(np.asarray(rew)).all()


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
def test_fused_rooms_fixed_goal():
    env = gpt.make("Rooms-v0", layout="4", obs_type="mdp")  # default fixed goal
    B, K = 128, 16
    run = make_fused_rooms_rollout(env, B, K, interpret=True)
    a0, g0 = _init(env, B)
    a, g, rew = run(jnp.asarray([1], jnp.int32), a0, g0)
    GW = env.grid_np.shape[1]
    expect = int(env.fixed_goal_yx[0] * GW + env.fixed_goal_yx[1])
    assert (np.asarray(g) == expect).all()


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="the TPU interpreter's prng_random_bits returns zeros on CPU",
)
def test_fused_rooms_stats_match_scan():
    """Hardware check: random-policy mean reward matches the scan path
    (verified: 0.0016 vs 0.0016 on layout '4' at B=64k)."""
    from gym_po_tpu.vector import rollout

    env = gpt.make("Rooms-v0", layout="4", obs_type="mdp", goal_xy=None)
    B, K = 4096, 128
    run = make_fused_rooms_rollout(env, B, K)
    a0, g0 = _init(env, B)
    _, _, rew = run(jnp.asarray([5], jnp.int32), a0, g0)
    fused_mean = float(np.asarray(rew).mean()) / K
    traj, _ = jax.jit(lambda k: rollout(env, k, None, B, K))(jax.random.PRNGKey(0))
    scan_mean = float(np.asarray(traj.reward).mean())
    assert abs(fused_mean - scan_mean) < 0.002, (fused_mean, scan_mean)


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel",
)
def test_fused_rooms_episode_stats():
    """Zero-PRNG interpret: the failure coin always fires with alternate
    action 0... dynamics are deterministic; stats fields must be finite,
    consistent (len <= (time_limit+1)*cnt) and monotone with racc."""
    env = gpt.make("Rooms-v0")
    B = 256
    K = env.time_limit + 10
    GW = env.grid_np.shape[1]
    run = make_fused_rooms_rollout(env, B, K, interpret=True,
                                   episode_stats=True)
    _, st = env.reset_vec(jax.random.PRNGKey(0), B)
    a = (st.agent_yx[:, 0] * GW + st.agent_yx[:, 1]).reshape(-1, 128).astype(jnp.int32)
    g = (st.goal_yx[:, 0] * GW + st.goal_yx[:, 1]).reshape(-1, 128).astype(jnp.int32)
    out = run(jnp.asarray([3], jnp.int32), a, g)
    assert len(out) == 6
    ep_ret, ep_len, ep_cnt = (np.asarray(o).reshape(-1) for o in out[3:])
    assert (ep_cnt >= 1).all()  # every env truncates at least once in K
    assert (ep_len <= (env.time_limit + 1) * ep_cnt).all()
    assert np.isfinite(ep_ret).all()
