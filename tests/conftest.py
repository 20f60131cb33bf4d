"""Test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4.5): the same
shard_map/pjit code paths as a TPU pod slice, validated without TPU hardware.
Environment variables must be set before JAX is imported anywhere.
"""

import os

# Headless MuJoCo rendering (render_ant_scene): the GL backend is chosen at
# the FIRST `import mujoco` anywhere in the process, so the choice must be
# pinned before any test (or importorskip) pulls mujoco in.
os.environ.setdefault("MUJOCO_GL", "egl")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Pin the CPU codegen to a pre-FMA ISA for parity tests: with AVX2+FMA the
# LLVM backend contracts f32 `a*b + c` chains into fused multiply-adds inside
# XLA loop fusions (no HLO-level control, optimization_barrier doesn't reach
# codegen), which breaks bit-exact equality with NumPy's two-rounding result
# under cancellation (car_flag velocity, SURVEY.md §7 hard-part 1).
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=SSE4_2"
os.environ["XLA_FLAGS"] = flags.strip()

# Force the CPU backend: the harness environment pre-sets JAX_PLATFORMS to the
# remote-TPU plugin, where every dispatch pays a ~30 ms tunnel round-trip —
# unusable for host-driven parity loops.  Set GYM_PO_TEST_ON_TPU=1 to opt out.
# NOTE: a sitecustomize module imports jax at interpreter startup, so env vars
# set here are too late — update jax.config instead (backends init lazily).
if os.environ.get("GYM_PO_TEST_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def x64():
    """Enable float64 for bit-exact continuous-env parity tests.

    Function-scoped so the flag never leaks into perf-mode tests that
    assume default f32/i32 dtypes.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
