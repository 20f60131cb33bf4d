"""Checkpoint/resume and profiling utilities."""

import numpy as np

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.utils import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
    steps_per_second,
)


def test_env_state_checkpoint_roundtrip(tmp_path):
    env = gpt.make("HansenTaxi-v4")
    key = jax.random.PRNGKey(0)
    obs, state = jax.vmap(env.reset)(jax.random.split(key, 8))
    save_checkpoint(str(tmp_path / "ck"), 0, state)
    template = jax.tree.map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path / "ck"), template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_resume_is_exact(tmp_path):
    """save -> restore -> step == straight-through step (bit-exact resume)."""
    from gym_po_tpu.agents import PPOConfig, init_train_state, make_train_step

    env = gpt.make("Taxi-v4")
    cfg = PPOConfig(num_envs=8, rollout_steps=4, epochs=1, minibatches=1,
                    hidden=(8,))
    net, ts = init_train_state(env, cfg, jax.random.PRNGKey(0))
    step = make_train_step(env, net, cfg)
    ts1, _ = step(ts)
    save_checkpoint(str(tmp_path / "ck"), 1, ts1)
    ts2a, _ = step(ts1)  # straight through

    template = jax.tree.map(jnp.zeros_like, ts1)
    ts1r = restore_checkpoint(str(tmp_path / "ck"), template)
    ts2b, _ = step(ts1r)  # resumed
    for a, b in zip(jax.tree.leaves(ts2a.params), jax.tree.leaves(ts2b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert latest_step(str(tmp_path / "ck")) == 1


def test_steps_per_second_meter():
    from gym_po_tpu.vector import rollout

    env = gpt.make("Taxi-v4")
    run = jax.jit(lambda k: rollout(env, k, None, 32, 16)[0].reward.sum())
    sps = steps_per_second(
        run, jax.random.PRNGKey(0), steps_per_call=32 * 16, iters=2
    )
    assert sps > 0
