"""Debug-mode runtime checks (SURVEY.md §5 sanitizer analog).

The runtime is pure-functional, so there is nothing to race; the failure
modes are numeric (NaN/Inf) and indexing (OOB gathers).  :func:`checked`
wraps any jittable function with ``jax.experimental.checkify`` so those
errors surface with locations instead of silently propagating — the
debug-mode counterpart of a sanitizer build.

Usage::

    step = checked(env.step_vec)           # debug mode
    obs, state, *rest = step(key, state, a)  # raises on NaN/OOB

Zero overhead when not used; perf mode never imports this module.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify

__all__ = ["checked", "assert_finite"]


def checked(fn: Callable, errors=None, jit: bool = True) -> Callable:
    """Wrap ``fn`` with checkify (NaN + OOB-index + div-by-zero checks) and
    raise on the first error.

    The returned function is already jitted (``jit=True``) — do NOT wrap it
    in ``jax.jit`` again: ``err.throw()`` must run outside the traced region.
    """
    if errors is None:
        errors = (
            checkify.float_checks
            | checkify.index_checks
            | checkify.div_checks
        )
    cfn = checkify.checkify(fn, errors=errors)
    if jit:
        cfn = jax.jit(cfn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "pytree") -> None:
    """Host-side check that every leaf is finite (post-fetch validation)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
