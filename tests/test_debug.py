"""Debug-mode checks (checkify wrapper + host finite assertion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import gym_po_tpu as gpt
from gym_po_tpu.utils import assert_finite, checked


def test_checked_step_passes_clean():
    env = gpt.make("CarFlag-v0", time_limit=20)
    step = checked(env.step_vec)
    key = jax.random.PRNGKey(0)
    obs, st = env.reset_vec(key, 8)
    obs, st, r, d, tr, _ = step(key, st, jnp.zeros((8, 1)))
    assert_finite((obs, r), "step outputs")


def test_checked_step_catches_nan():
    env = gpt.make("CarFlag-v0", time_limit=20)
    step = checked(env.step_vec)
    key = jax.random.PRNGKey(0)
    _, st = env.reset_vec(key, 8)
    bad = st.replace(pos=st.pos.at[0].set(jnp.nan))
    with pytest.raises(Exception, match="nan"):
        jax.block_until_ready(step(key, bad, jnp.zeros((8, 1))))


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        assert_finite({"x": np.array([1.0, np.inf])})
    assert_finite({"x": np.array([1.0, 2.0]), "i": np.array([1, 2])})
