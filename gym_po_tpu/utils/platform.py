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

__all__ = ["pin_platform_from_env"]


def pin_platform_from_env() -> None:
    """Re-apply the ``JAX_PLATFORMS`` env var via ``jax.config``.

    No-op when the variable is unset (the environment's default backend —
    the TPU tunnel when available — is used).
    """
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        jax.config.update("jax_platforms", platforms.lower())
