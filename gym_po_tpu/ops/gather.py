"""TPU-tuned table gathers.

Grid-world env steps are gather-bound on TPU: a native 1-D gather of a
[B]-vector of indices runs at ~130M elements/s/chip regardless of table size
(it serializes on the VPU), while the same lookup expressed as
``one_hot(idx) @ table`` rides the MXU.  Measured on v5e at B=64k:

    table size    native gather    one-hot f32 matmul
         512         114 M/s            699 M/s
        2560         130 M/s            207 M/s
        4608         130 M/s            122 M/s
       23040         129 M/s             26 M/s

:func:`table_gather` picks the winner by table size.  The matmul path is
exact for integer tables with values < 2**24 (f32 mantissa) — every lookup
table in this package is far below that.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["table_gather", "row_gather", "ONE_HOT_MAX_TABLE"]

# crossover vs native gather measured on TPU v5e (see module docstring)
ONE_HOT_MAX_TABLE = 4096


# NOTE: a bf16 one-hot variant (for tables with values in [-256, 256]) was
# measured and is throughput-neutral — XLA fuses the one-hot generation into
# the matmul so its HBM traffic never materializes; f32 keeps exactness
# trivially for all tables.


def table_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a 1-D table, via MXU one-hot matmul when profitable.

    ``table`` must be integer (or exactly-representable float) with values
    < 2**24 when the one-hot path is taken; asserted at trace time for int
    tables built from host constants.
    """
    (ns,) = table.shape
    if ns > ONE_HOT_MAX_TABLE:
        return table[idx]
    oh = jax.nn.one_hot(idx, ns, dtype=jnp.float32)
    # HIGHEST precision: the TPU MXU's default f32 mode rounds operands
    # through bf16 (exact only for values <= 256); the 3-pass mode
    # represents any f32 exactly, so the single-nonzero-product one-hot
    # contraction is bit-exact.
    vals = jnp.dot(
        oh,
        table.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return vals.astype(table.dtype)


def row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for a 2-D [ns, k] table (row lookup), MXU path when
    profitable.  Same exactness contract as :func:`table_gather`."""
    ns, _ = table.shape
    if ns > ONE_HOT_MAX_TABLE:
        return table[idx]
    oh = jax.nn.one_hot(idx, ns, dtype=jnp.float32)
    rows = jnp.matmul(
        oh,
        table.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return rows.astype(table.dtype)


def assert_one_hot_exact(table: np.ndarray) -> None:
    """Host-side guard: one-hot matmul reproduces this table exactly."""
    if table.size and int(np.abs(table).max()) >= 2**24:
        raise ValueError("table values exceed f32 exact-integer range")
