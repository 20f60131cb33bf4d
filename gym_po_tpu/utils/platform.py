"""Backend-selection helper for driver scripts.

This build environment's ``sitecustomize`` imports jax at interpreter start
and pre-registers the remote-TPU (axon) plugin, which breaks the standard
``JAX_PLATFORMS`` env-var semantics: a child process spawned with
``JAX_PLATFORMS=cpu`` still initializes the TPU backend — and if the TPU
tunnel is unreachable, backend init hangs indefinitely in
``make_c_api_client``.  ``jax.config.update`` after import still works
because backends initialize lazily (see tests/conftest.py, CLAUDE.md).

Driver scripts (examples/, benchmarks run under pytest) call
:func:`pin_platform_from_env` before their first device use so an explicit
``JAX_PLATFORMS`` from the parent environment is honored again.
"""

from __future__ import annotations

import os

import jax

__all__ = ["pin_platform_from_env", "enable_compilation_cache"]


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (works over the axon
    tunnel: measured 108 s cold → 1.2 s cached across processes).

    Cold XLA compiles of the ant engine cost MINUTES on the remote chip
    (BASELINE.md compile-time table), so every bench/driver entry point
    enables this.  Default location is ``<repo>/.jax_cache`` (gitignored)
    so the cache survives across driver invocations on the same machine."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def pin_platform_from_env() -> None:
    """Re-apply the ``JAX_PLATFORMS`` env var via ``jax.config``.

    No-op when the variable is unset (the environment's default backend —
    the TPU tunnel when available — is used).
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms.lower())
