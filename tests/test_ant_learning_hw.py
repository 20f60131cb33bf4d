"""Hardware learning smoke on the ARTICULATED ant (VERDICT r3 #3).

Asserts that PPO improves the tag rate on ``AntTagPhysics-v0`` itself —
not the point-mass surrogate.  400 updates at the calibrated config
(euler, B=2048, T=32, entropy_coef=0.001) reproduce the measured trend
(BASELINE.md: chunk-400 tag rate ≈ 1.9e-4 vs first-chunk 1.7e-6, a 113x
rise); the assertion's 10x threshold leaves an order of magnitude of
margin.  Runtime ≈ 9 min at the measured 47k env-steps/s plus compile
(cached by ``enable_compilation_cache`` after the first run on a machine
— the same executable as ``benchmarks/ant_learning.py``).

TPU-gated + slow: euler-CPU would need hours for 26M env steps.
"""

import jax
import numpy as np
import pytest

import gym_po_tpu as gpt
from gym_po_tpu.agents import PPOConfig, init_train_state, make_train_step
from gym_po_tpu.utils import enable_compilation_cache

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="learning run needs the real chip (26M env steps)",
    ),
]


def test_ppo_improves_tag_rate_on_articulated_ant():
    enable_compilation_cache()
    env = gpt.make("AntTagPhysics-v0", integrator="euler")
    cfg = PPOConfig(num_envs=2048, rollout_steps=32, entropy_coef=0.001,
                    hidden=(64, 64))
    net, ts = init_train_state(env, cfg, jax.random.PRNGKey(0))
    step = make_train_step(env, net, cfg)

    # per-update dispatches on purpose: >~80 s single dispatches crash the
    # tunnel worker (BASELINE.md operational note)
    def chunk(ts, n):
        ms = []
        for _ in range(n):
            ts, m = step(ts)
            ms.append(m["mean_reward"])
        return ts, float(np.mean([np.asarray(x) for x in ms]))

    ts, first = chunk(ts, 100)
    for _ in range(2):
        ts, _ = chunk(ts, 100)
    ts, last = chunk(ts, 100)

    # measured: first ≈ 1.7e-6 (random ≈ 0.08% of episodes), last ≈ 1.9e-4
    assert last > 10 * max(first, 2e-6), (first, last)
    assert last > 5e-5, (first, last)
