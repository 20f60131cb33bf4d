"""Taxi: unit tests, jit/vmap consistency, and bit-exact parity vs reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_po_tpu.envs.taxi import Taxi, TAXI_MAP, EXTENDED_TAXI_MAP
from gym_po_tpu.compat.parity import TaxiParityDriver, reference_rng
from gym_po_tpu.maps.taxi_maps import compile_taxi_map, decode_state_np, encode_state_np

from _reference import load_reference_module


# --------------------------------------------------------------------- units
def test_codec_roundtrip():
    t = compile_taxi_map(TAXI_MAP)
    s = np.arange(t.ns)
    r, c, p, d = decode_state_np(s, t.cols, t.nlocs)
    assert (encode_state_np(r, c, p, d, t.cols, t.nlocs) == s).all()
    assert r.max() == t.rows - 1 and c.max() == t.cols - 1
    assert p.max() == t.nlocs and d.max() == t.nlocs - 1


@pytest.mark.parametrize("map_rows", [TAXI_MAP, EXTENDED_TAXI_MAP])
def test_tables_match_reference_geometry(map_rows):
    """Transition/hansen tables reproduce the reference's runtime geometry."""
    ref = load_reference_module("gym_po.envs.extended_taxi")
    t = compile_taxi_map(map_rows)
    renv = ref.TaxiVecEnv(1, map=map_rows)
    # Hansen encodings (reference extended_taxi.py:102-114)
    assert (t.hansen_grid == renv.hansen_encodings).all()
    # Landmarks and state distribution (reference :182-218)
    assert (t.np_locs == renv.np_locs).all()
    assert np.allclose(t.state_distribution, renv.state_distribution)

    # Movement: step the reference from every decodable state, every action
    B = t.ns
    renv_b = ref.TaxiVecEnv(B, map=map_rows)
    for a in range(4):
        renv_b.reset(seed=0)
        renv_b.s = np.arange(t.ns)
        renv_b.elapsed[:] = 0
        renv_b.n_dropoffs_completed[:] = 0
        renv_b.step(np.full(B, a))
        assert (renv_b.s == t.next_s[:, a]).all(), f"action {a}"


def test_pickup_dropoff_events():
    ref = load_reference_module("gym_po.envs.extended_taxi")
    t = compile_taxi_map(TAXI_MAP)
    B = t.ns
    renv = ref.TaxiVecEnv(B, map=TAXI_MAP, num_passengers=10**9)  # never done
    renv.reset(seed=0)
    renv.s = np.arange(t.ns)
    renv.elapsed[:] = 0
    renv.n_dropoffs_completed[:] = 0
    _, rew, done, trunc, _ = renv.step(np.full(B, 4))
    # classification: goal=+1, bad=-0.5, pickup/none=-0.05
    ev = t.event[:, 4]
    exp = np.where(ev == 1, 1.0, np.where(ev == 3, -0.5, -0.05)).astype(np.float32)
    assert (rew == exp).all()
    # pickup result state matches (goal states get p/d re-randomized by the
    # reference's task reset, so compare only non-goal rows)
    ng = ev != 1
    assert (renv.s[ng] == t.next_s[ng, 4]).all()


# --------------------------------------------------- jit/vmap/perf-mode sanity
def test_perf_mode_rollout_invariants():
    env = Taxi(map=EXTENDED_TAXI_MAP, hansen_obs=True)
    B, T = 64, 300
    key = jax.random.PRNGKey(0)
    kr, key = jax.random.split(key)
    obs, state = jax.vmap(env.reset)(jax.random.split(kr, B))

    step = jax.jit(jax.vmap(env.step))
    n_obs = env.observation_space.n
    for _ in range(T // 50):
        for _ in range(50):
            key, ka, ks = jax.random.split(key, 3)
            actions = jax.random.randint(ka, (B,), 0, 5)
            obs, state, rew, done, trunc, info = step(
                jax.random.split(ks, B), state, actions
            )
        o = np.asarray(obs)
        assert ((o >= 0) & (o < n_obs)).all()
        assert np.asarray(state.elapsed).max() <= env.time_limit + 1
    # dones happen eventually in 300 steps of random play on taxi? not guaranteed;
    # but truncation at time_limit=200 < T=300 must have fired and reset the
    # counter — without a reset, elapsed would equal T for every env.
    assert np.asarray(state.elapsed).max() < T
    assert np.asarray(state.elapsed).max() <= env.time_limit + 1


def test_jit_nonjit_consistency():
    env = Taxi()
    key = jax.random.PRNGKey(3)
    obs, state = env.reset(key)
    a = jnp.int32(1)
    k = jax.random.PRNGKey(7)
    out_nj = env.step(k, state, a)
    out_j = jax.jit(env.step)(k, state, a)
    for x, y in zip(out_nj[:5], out_j[:5]):
        assert np.asarray(x).tolist() == np.asarray(y).tolist()


# ------------------------------------------------------------ bit-exact parity
@pytest.mark.parametrize(
    "map_rows,hansen",
    [
        (TAXI_MAP, False),
        (TAXI_MAP, True),
        (EXTENDED_TAXI_MAP, False),
        (EXTENDED_TAXI_MAP, True),
    ],
)
@pytest.mark.parametrize("seed", [0, 12345])
def test_parity_vs_reference(map_rows, hansen, seed):
    """Full-trajectory bit-exact equality vs the reference NumPy env."""
    ref = load_reference_module("gym_po.envs.extended_taxi")
    B, T = 16, 450  # crosses the 200-step truncation boundary twice
    renv = ref.TaxiVecEnv(B, map=map_rows, hansen_obs=hansen)
    env = Taxi(map=map_rows, hansen_obs=hansen)
    drv = TaxiParityDriver(env, B)

    ref_obs, _ = renv.reset(seed=seed)
    obs, state = drv.reset(seed)
    assert (np.asarray(ref_obs) == obs).all()

    arng = np.random.default_rng(999)
    for t in range(T):
        actions = arng.integers(0, 5, B)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        assert (np.asarray(ro) == o).all(), f"obs mismatch at t={t}"
        assert (np.asarray(rr) == r).all(), f"reward mismatch at t={t}"
        assert (np.asarray(rd) == d).all(), f"done mismatch at t={t}"
        assert (np.asarray(rt) == tr).all(), f"trunc mismatch at t={t}"


def test_multipassenger_parity():
    ref = load_reference_module("gym_po.envs.extended_taxi")
    B, T, seed = 8, 300, 42
    renv = ref.TaxiVecEnv(B, map=TAXI_MAP, num_passengers=3)
    env = Taxi(map=TAXI_MAP, num_passengers=3)
    drv = TaxiParityDriver(env, B)
    ref_obs, _ = renv.reset(seed=seed)
    obs, state = drv.reset(seed)
    assert (np.asarray(ref_obs) == obs).all()
    arng = np.random.default_rng(1)
    for t in range(T):
        actions = arng.integers(0, 5, B)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        assert (np.asarray(ro) == o).all() and (np.asarray(rr) == r).all()
        assert (np.asarray(rd) == d).all() and (np.asarray(rt) == tr).all()


def test_extended_multipassenger_hansen_parity():
    """Extended 8x8 map + 2 passengers + Hansen obs, crossing truncation."""
    ref = load_reference_module("gym_po.envs.extended_taxi")
    B, T, seed = 8, 260, 17
    renv = ref.TaxiVecEnv(
        B, map=EXTENDED_TAXI_MAP, num_passengers=2, hansen_obs=True,
        time_limit=120,
    )
    env = Taxi(map=EXTENDED_TAXI_MAP, num_passengers=2, hansen_obs=True,
               time_limit=120)
    drv = TaxiParityDriver(env, B)
    ref_obs, _ = renv.reset(seed=seed)
    obs, state = drv.reset(seed)
    assert (np.asarray(ref_obs) == obs).all()
    arng = np.random.default_rng(3)
    for t in range(T):
        actions = arng.integers(0, 5, B)
        ro, rr, rd, rt, _ = renv.step(actions)
        o, state, r, d, tr = drv.step(state, actions)
        assert (np.asarray(ro) == o).all(), f"obs t={t}"
        assert (np.asarray(rr) == r).all(), f"rew t={t}"
        assert (np.asarray(rd) == d).all() and (np.asarray(rt) == tr).all(), t
