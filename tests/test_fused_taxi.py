"""Pallas fused taxi rollout: semantic checks in interpreter mode (CPU).

The kernel's dynamics must match ``Taxi.step_vec`` distributionally — same
transition tables, same reset distributions — just a different PRNG stream.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.maps.taxi_maps import decode_state_np
from gym_po_tpu.ops import make_fused_taxi_rollout, state_policy_table


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
@pytest.mark.parametrize("name", ["Taxi-v4", "ExtendedHansenTaxi-v4"])
def test_fused_rollout_state_validity(name):
    env = gpt.make(name)
    B, K = 256, 64
    run = make_fused_taxi_rollout(env, B, K, interpret=True)
    key = jax.random.PRNGKey(0)
    _, st = env.reset_vec(key, B)
    s = st.s.reshape(-1, 128)
    s2, rew = run(jnp.asarray([3], jnp.int32), s)
    sn = np.asarray(s2).reshape(-1)
    t = env.tables
    assert (sn >= 0).all() and (sn < t.ns).all()
    r, c, p, d = decode_state_np(sn.astype(np.int64), t.cols, t.nlocs)
    # agent never on an interior wall cell
    valid = (t.tgrid != "|").reshape(-1)
    assert valid[r * t.cols + c].all()
    # per-step mean reward of a random policy is near the known regime
    mean_r = float(np.asarray(rew).mean()) / K
    assert -0.25 < mean_r < 0.05, mean_r


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="the TPU interpreter's prng_random_bits returns zeros on CPU; "
    "the distributional check needs the hardware PRNG",
)
def test_fused_reward_stats_match_scan_path():
    """Random-policy mean reward: fused kernel vs step_vec (distributional).
    Verified on hardware: fused -0.1379 vs scan -0.1373 at B=64k."""
    env = gpt.make("Taxi-v4")
    B, K = 512, 200
    run = make_fused_taxi_rollout(env, B, K)
    key = jax.random.PRNGKey(1)
    _, st = env.reset_vec(key, B)
    _, rew = run(jnp.asarray([11], jnp.int32), st.s.reshape(-1, 128))
    fused_mean = float(np.asarray(rew).mean()) / K

    from gym_po_tpu.vector import rollout

    traj, _ = jax.jit(lambda k: rollout(env, k, None, B, K))(key)
    scan_mean = float(np.asarray(traj.reward).mean())
    assert abs(fused_mean - scan_mean) < 0.02, (fused_mean, scan_mean)


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
def test_fused_rejects_bad_shapes():
    env = gpt.make("Taxi-v4")
    with pytest.raises(ValueError):
        make_fused_taxi_rollout(env, 100, 10)  # not a multiple of 128


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
def test_fused_policy_eval_matches_scan_exactly():
    """Greedy-table actions, K << time_limit, policy never does action 4:
    no env can terminate, so the dynamics are fully deterministic and the
    fused path must match ``step_vec`` BIT-EXACTLY (no PRNG consumed)."""
    from gym_po_tpu.vector import rollout

    env = gpt.make("Taxi-v4")
    t = env.tables
    pol = (np.arange(t.ns) % 4).astype(np.int32)  # moves only, never pickup
    B, K = 256, 32
    run = make_fused_taxi_rollout(env, B, K, interpret=True, policy=pol)
    _, st = env.reset_vec(jax.random.PRNGKey(2), B)
    s2, rew = run(jnp.asarray([3], jnp.int32), st.s.reshape(-1, 128))

    pol_j = jnp.asarray(pol)
    traj, (_, st_f) = rollout(
        env,
        jax.random.PRNGKey(9),
        lambda k, obs: pol_j[obs],
        B,
        K,
        init=(env.observe(st), st),
    )
    np.testing.assert_array_equal(
        np.asarray(s2).reshape(-1), np.asarray(st_f.s)
    )
    np.testing.assert_allclose(
        np.asarray(rew).reshape(-1),
        np.asarray(traj.reward).sum(0),
        rtol=1e-6,
    )


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
def test_fused_policy_table_size_check():
    env = gpt.make("Taxi-v4")
    with pytest.raises(ValueError):
        make_fused_taxi_rollout(env, 256, 8, policy=np.zeros(7, np.int32))


def test_state_policy_table_composes_hansen_obs():
    """π_state[s] = π_obs[obs(s)] for the Hansen partial-obs variant."""
    env = gpt.make("HansenTaxi-v4")
    n_obs = int(env.observation_space.n)
    rng = np.random.default_rng(0)
    pol_obs = jnp.asarray(rng.integers(0, 5, n_obs, dtype=np.int32))
    table = state_policy_table(env, lambda k, obs: pol_obs[obs])
    assert table.shape == (env.tables.ns,)
    # spot-check a handful of states through the env's own observe()
    from gym_po_tpu.envs.taxi import TaxiState

    s = jnp.asarray(rng.integers(0, env.tables.ns, 64, dtype=np.int32))
    z = jnp.zeros_like(s)
    obs = env.observe(TaxiState(elapsed=z, s=s, completed=z))
    np.testing.assert_array_equal(table[np.asarray(s)], np.asarray(pol_obs[obs]))


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="TPU interpreter PRNG returns zeros on CPU",
)
def test_fused_policy_eval_stats_match_scan():
    """Hardware: same fixed policy table, fused vs scan mean reward agree
    (different PRNG streams only drive the episode resets)."""
    from gym_po_tpu.vector import rollout

    env = gpt.make("Taxi-v4")
    t = env.tables
    rng = np.random.default_rng(5)
    pol = rng.integers(0, 5, t.ns, dtype=np.int32)
    B, K = 8192, 256
    run = make_fused_taxi_rollout(env, B, K, policy=pol)
    _, st = env.reset_vec(jax.random.PRNGKey(0), B)
    _, rew = run(jnp.asarray([13], jnp.int32), st.s.reshape(-1, 128))
    fused_mean = float(np.asarray(rew).mean()) / K

    pol_j = jnp.asarray(pol)
    traj, _ = jax.jit(
        lambda k: rollout(env, k, lambda kk, obs: pol_j[obs], B, K)
    )(jax.random.PRNGKey(1))
    scan_mean = float(np.asarray(traj.reward).mean())
    assert abs(fused_mean - scan_mean) < 0.02, (fused_mean, scan_mean)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="TPU interpreter PRNG returns zeros on CPU",
)
def test_fused_multi_passenger_and_occupancy():
    """3-passenger config + cell-occupancy distribution vs the scan path.

    (Hardware soak verified: 40 chained invocations / 655M steps keep all
    states valid; mean reward -0.1379 fused vs -0.1380 scan.)
    """
    from gym_po_tpu.maps.taxi_maps import decode_state_np
    from gym_po_tpu.vector import rollout

    env = gpt.make("Taxi-v4", num_passengers=3)
    B, K = 8192, 256
    run = make_fused_taxi_rollout(env, B, K)
    _, st = env.reset_vec(jax.random.PRNGKey(0), B)
    s, rew = run(jnp.asarray([7], jnp.int32), st.s.reshape(-1, 128))
    t = env.tables
    sn = np.asarray(s).reshape(-1).astype(np.int64)
    r1, c1, _, _ = decode_state_np(sn, t.cols, t.nlocs)
    occ_fused = np.bincount(r1 * t.cols + c1, minlength=25) / sn.size

    traj, (obs_f, st_f) = jax.jit(lambda k: rollout(env, k, None, B, K))(
        jax.random.PRNGKey(1)
    )
    sn2 = np.asarray(st_f.s).astype(np.int64)
    r2, c2, _, _ = decode_state_np(sn2, t.cols, t.nlocs)
    occ_scan = np.bincount(r2 * t.cols + c2, minlength=25) / sn2.size
    # same long-run cell-occupancy distribution (different PRNG streams)
    np.testing.assert_allclose(occ_fused, occ_scan, atol=0.01)


@pytest.mark.skipif(
    jax.devices()[0].platform == "tpu",
    reason="interpret-mode kernels dispatch per-op over the TPU tunnel (hours)",
)
def test_fused_episode_stats():
    """Zero-PRNG interpret: action 0 forever -> every env truncates exactly
    once at step time_limit+1 with a fully predictable episode record."""
    env = gpt.make("Taxi-v4")
    B = 256
    K = env.time_limit + 10  # one truncation + a partial episode
    run = make_fused_taxi_rollout(env, B, K, interpret=True,
                                  episode_stats=True)
    _, st = env.reset_vec(jax.random.PRNGKey(0), B)
    s2, rew, ep_ret, ep_len, ep_cnt = run(
        jnp.asarray([3], jnp.int32), st.s.reshape(-1, 128)
    )
    ep_ret = np.asarray(ep_ret).reshape(-1)
    ep_len = np.asarray(ep_len).reshape(-1)
    ep_cnt = np.asarray(ep_cnt).reshape(-1)
    L = env.time_limit + 1  # strict > truncation (reference :279)
    np.testing.assert_array_equal(ep_cnt, 1.0)
    np.testing.assert_array_equal(ep_len, float(L))
    np.testing.assert_allclose(ep_ret, env.reward_any * L, rtol=1e-5)
    # completed-episode sums never exceed the total accumulated reward
    assert (np.asarray(rew).reshape(-1) <= ep_ret + 1e-5).all()
