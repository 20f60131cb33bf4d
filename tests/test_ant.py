"""MuJoCo ant POMDPs: semantic tests vs the reference behavior contract.

Physics is MuJoCo C (host), same substrate as the reference — these check the
observation/reward/target logic documented in SURVEY.md §3.7/E6-E7.
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

from gym_po_tpu.envs.ant import AntHeavenHellEnv, AntTagEnv  # noqa: E402


@pytest.fixture(scope="module")
def tag():
    return AntTagEnv()


@pytest.fixture(scope="module")
def hh():
    return AntHeavenHellEnv()


def test_tag_reset_contract(tag):
    obs, info = tag.reset(seed=0)
    assert obs.shape == (29,) and obs.dtype == np.float32
    # target at least min_distance away => not visible => last 2 dims zero
    assert (obs[-2:] == 0).all()
    ant_xy = tag.data.qpos[:2]
    assert np.linalg.norm(ant_xy - tag.target_pos) > 5.0
    # indicator spheres track the ant
    np.testing.assert_allclose(tag.data.mocap_pos[1, :2], ant_xy)


def test_tag_step_and_visibility(tag):
    tag.reset(seed=1)
    # teleport the target next to the ant: visible and almost tagged
    ant_xy = tag.data.qpos[:2].copy()
    tag.data.mocap_pos[0, :2] = ant_xy + np.array([2.0, 0.0])
    obs, r, d, tr, _ = tag.step(np.zeros(8))
    if not d:  # target may have moved/tagged; visible => obs tail nonzero
        assert np.abs(obs[-2:]).sum() > 0 or np.linalg.norm(
            tag.data.qpos[:2] - tag.target_pos
        ) >= 3.0


def test_tag_reward_on_tag(tag):
    tag.reset(seed=2)
    ant_xy = tag.data.qpos[:2].copy()
    # 0.5 away: even after one sim step + a 0.5 target move, still <= 1.5
    tag.data.mocap_pos[0, :2] = ant_xy + np.array([0.5, 0.0])
    obs, r, d, tr, _ = tag.step(np.zeros(8))
    assert d and r == 1.0


def test_tag_target_stays_in_cage(tag):
    tag.reset(seed=3)
    for t in range(40):
        tag.step(np.random.default_rng(t).uniform(-1, 1, 8))
        assert (np.abs(tag.target_pos) <= 4.5 + 1e-9).all()


def test_hh_reset_contract(hh):
    obs, info = hh.reset(seed=0)
    assert obs.shape == (28,) and obs.dtype == np.float32
    assert obs[-1] == 0.0  # priest not in range at spawn
    assert abs(hh.heaven_direction) == 1.0
    # site colors match the flip
    right = np.asarray(hh.model.site("right_area").rgba)
    left = np.asarray(hh.model.site("left_area").rgba)
    if hh.heaven_direction > 0:
        assert right[1] == 1.0 and left[0] == 1.0  # right green, left red
    else:
        assert right[0] == 1.0 and left[1] == 1.0


def test_hh_heaven_flip_is_random():
    env = AntHeavenHellEnv()
    dirs = set()
    for s in range(12):
        env.reset(seed=s)
        dirs.add(env.heaven_direction)
    assert dirs == {-1.0, 1.0}


def test_hh_priest_reveals_direction(hh):
    hh.reset(seed=1)
    # teleport the ant to the priest
    qpos = hh.data.qpos.copy()
    qpos[:2] = (0.0, 6.0)
    hh.set_state(qpos, hh.data.qvel.copy())
    obs, r, d, tr, _ = hh.step(np.zeros(8))
    assert obs[-1] == hh.heaven_direction
    assert not d and r == 0.0


def test_hh_terminal_rewards(hh):
    hh.reset(seed=2)
    heaven = hh.heaven_pos
    qpos = hh.data.qpos.copy()
    qpos[:2] = heaven
    hh.set_state(qpos, hh.data.qvel.copy())
    obs, r, d, tr, _ = hh.step(np.zeros(8))
    assert d and r == 1.0
    hh.reset(seed=3)
    hell = hh._sites[0] if (hh.heaven_pos == hh._sites[1]).all() else hh._sites[1]
    qpos = hh.data.qpos.copy()
    qpos[:2] = hell
    hh.set_state(qpos, hh.data.qvel.copy())
    obs, r, d, tr, _ = hh.step(np.zeros(8))
    assert d and r == -1.0


def test_gymnasium_registration():
    import gymnasium

    import gym_po_tpu  # noqa: F401 - triggers registration

    env = gymnasium.make("pdomains-ant-heaven-hell-v1")
    obs, _ = env.reset(seed=0)
    assert obs.shape == (28,)
    assert env.spec.max_episode_steps == 500
