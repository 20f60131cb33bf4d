"""Hardware memory-learning smoke on the ARTICULATED heaven-hell ant
(VERDICT r4 #1) — the definitive POMDP result.

GRU-PPO on ``AntHeavenHellPhysics-v0`` (euler speed knob, γ=1 PBRS
shaping as the exploration aid — policy-invariant, `envs/shaping.py`)
reproduces the measured r5 trend: heaven arrivals rise from ~0 to
7.5e-4/step by update 100 and 1.6e-3 by update 125 with heaven_frac
PINNED AT 1.0 — the recurrent policy carries the priest's reveal through
the ambiguous corridor and never once walks to hell (BASELINE.md
heaven-hell table; full run `benchmarks/ant_learning.py --env
AntHeavenHellPhysics-v0 --rnn --shaped`).  The assertions keep >10x
margin on the arrival rate and allow a 10% hell fraction.

TPU-gated + slow: 150 updates = 9.8M env steps ≈ 18 min at the measured
9.1k env-steps/s (plus a cold ~25-min compile on an uncached machine).
"""

import jax
import numpy as np
import pytest

import gym_po_tpu as gpt
from gym_po_tpu.agents import PPOConfig, init_rnn_state, make_rnn_train_step
from gym_po_tpu.envs.shaping import PotentialShaped, heaven_hell_potential
from gym_po_tpu.utils import enable_compilation_cache

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="learning run needs the real chip (9.8M env steps)",
    ),
]


def test_gru_ppo_reaches_heaven_on_articulated_ant():
    enable_compilation_cache()
    env = PotentialShaped(
        gpt.make("AntHeavenHellPhysics-v0", integrator="euler"),
        heaven_hell_potential(0.1), gamma=1.0,
    )
    cfg = PPOConfig(num_envs=2048, rollout_steps=32, entropy_coef=0.001,
                    hidden=(64, 64), shuffle="none")
    net, ts = init_rnn_state(env, cfg, jax.random.PRNGKey(0), hidden=64)
    step = make_rnn_train_step(env, net, cfg)

    # per-update dispatches: >~80 s single dispatches crash the tunnel
    # worker (BASELINE.md operational note)
    pos, neg = [], []
    for _ in range(150):
        ts, m = step(ts)
        pos.append(float(m["pos_reward_rate"]))
        neg.append(float(m["neg_reward_rate"]))
    p, n = float(np.mean(pos[-25:])), float(np.mean(neg[-25:]))
    # measured: p ≈ 1.2e-3 over updates 125-150, n = 0.0 exactly
    assert p > 5e-5, (p, n)
    assert p / max(p + n, 1e-12) > 0.9, (p, n)
