"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4.5): the same
shard_map/pjit code paths as a TPU pod slice, validated without TPU hardware.
Environment variables must be set before JAX is imported anywhere.
"""

import os

# Force the CPU backend: the harness environment pre-sets JAX_PLATFORMS to the
# remote-TPU plugin, where every dispatch pays a ~30 ms tunnel round-trip —
# unusable for host-driven parity loops.  Set GYM_PO_TEST_ON_TPU=1 to opt out.
if os.environ.get("GYM_PO_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def x64():
    """Enable float64 for bit-exact continuous-env parity tests."""
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
