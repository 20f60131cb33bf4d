"""Car-Flag: bit-exact parity vs reference + perf-mode invariants."""

import numpy as np
import pytest

import jax

from gym_po_tpu.envs.car_flag import CarFlag, DiscreteCarFlag
from gym_po_tpu.compat.parity import CarFlagParityDriver

from _reference import load_reference_module


def _check(renv, drv, seed, T, action_fn):
    ref_obs, _ = renv.reset(seed=seed)
    obs, state = drv.reset(seed)
    np.testing.assert_array_equal(np.asarray(ref_obs), obs)
    arng = np.random.default_rng(seed + 1)
    for t in range(T):
        actions = action_fn(arng)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        np.testing.assert_array_equal(np.asarray(ro), o, err_msg=f"obs t={t}")
        np.testing.assert_array_equal(np.asarray(rr), r, err_msg=f"rew t={t}")
        assert (np.asarray(rd) == d).all() and (np.asarray(rt) == tr).all(), t


@pytest.mark.usefixtures("x64")
@pytest.mark.parametrize("seed", [0, 123])
def test_continuous_parity(seed):
    ref = load_reference_module("gym_po.envs.car_flag")
    B = 8
    renv = ref.CarVecEnv(B, time_limit=60)
    drv = CarFlagParityDriver(CarFlag(time_limit=60), B)
    _check(renv, drv, seed, T=140,
           action_fn=lambda g: g.uniform(-1, 1, (B, 1)).astype(np.float32))


@pytest.mark.usefixtures("x64")
def test_discrete_parity():
    ref = load_reference_module("gym_po.envs.car_flag")
    B, n = 8, 5
    renv = ref.DiscreteActionCarVecEnv(n, B, time_limit=60)
    drv = CarFlagParityDriver(DiscreteCarFlag(n, time_limit=60), B)
    _check(renv, drv, seed=7, T=140,
           action_fn=lambda g: g.integers(0, n, 8))


def test_perf_mode_invariants():
    env = CarFlag(time_limit=40)
    B = 16
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, B))
    step = jax.jit(jax.vmap(env.step))
    saw_done = False
    for _ in range(90):
        key, ka, ks = jax.random.split(key, 3)
        a = jax.random.uniform(ka, (B, 1), minval=-1, maxval=1)
        obs, state, r, d, tr, info = step(jax.random.split(ks, B), state, a)
        saw_done |= bool(np.asarray(d | tr).any())
    o = np.asarray(obs)
    assert (np.abs(o[:, 0]) <= 1.1).all()
    assert (np.abs(o[:, 1]) <= 0.07).all()
    assert np.isin(o[:, 2], [-1.0, 0.0, 1.0]).all()
    assert saw_done  # 40-step truncation must have fired within 90 steps
    hv = np.asarray(state.heaven)
    assert np.isin(hv, [-1.0, 1.0]).all()
