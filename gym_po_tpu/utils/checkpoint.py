"""Checkpoint / resume (SURVEY.md §5).

The reference never persists anything (env state is a few ints per instance).
Here everything — env state pytrees, PPO TrainState, PRNG keys — is a pytree
of arrays, so checkpointing is a single Orbax save/restore; resume is exact
because the PRNG is counter-based keys stored in the state itself.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _manager(directory: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, step: int, pytree: Any) -> None:
    """Save a pytree (env state, TrainState, ...) at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(pytree))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(
    directory: str, template: Any, step: Optional[int] = None
) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``template`` is a pytree with the right structure/shapes/dtypes (e.g. a
    freshly-initialized TrainState); restored arrays adopt its sharding.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    out = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return out


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step
