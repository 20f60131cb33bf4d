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


def _host_fingerprint() -> str:
    """Stable per-host tag: machine arch + CPU feature flags, hashed.

    XLA:CPU caches AOT-compiled machine code that embeds the *compiling*
    host's CPU features; loading such an entry on a host with a different
    feature set can SIGILL (the MULTICHIP_r04 artifact tail was a wall of
    ``cpu_aot_loader`` machine-feature-mismatch warnings from exactly this:
    the repo-local ``.jax_cache`` travelled to a different driver machine).
    Keying the cache dir by this fingerprint keeps same-machine reuse while
    making cross-machine entries invisible rather than lethal."""
    import hashlib
    import platform as _platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{_platform.machine()}|{feats}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (works over the axon
    tunnel: measured 108 s cold → 1.2 s cached across processes).

    Cold XLA compiles of the ant engine cost MINUTES on the remote chip
    (BASELINE.md compile-time table), so every bench/driver entry point
    enables this.  Default location is ``<repo>/.jax_cache/<host-fp>``
    (gitignored): the per-host fingerprint subdir prevents XLA:CPU AOT
    entries written on one machine from SIGILLing another (see
    :func:`_host_fingerprint`); TPU executables are compiled server-side
    and lose nothing from the split."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    path = os.path.join(path, _host_fingerprint())
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
