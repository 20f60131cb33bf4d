"""Randomness source abstraction for the fused Pallas kernels.

Hardware mode draws from the on-core PRNG (``pltpu.prng_random_bits``),
exactly as the kernels always have.  **Tape mode** replaces every draw with
a slice of a precomputed uint32 buffer, which makes every stochastic kernel
branch executable bit-exactly on CPU in interpret mode against a NumPy
oracle (VERDICT r1 item 5 — the TPU interpreter's PRNG returns all-zero
bits on CPU, so without a tape the stochastic paths were only testable on
hardware).

Tape layout
-----------
One uint32 (stored int32, bit pattern) tile row-block per *draw site* per
step: row block ``(site * num_steps + step) * R .. + R`` holds the ``[R, W]``
draw for call site ``site`` at loop step ``step``.  Sites are numbered in
body-trace order and restart at 0 every step (``begin_step``).  Keying the
index on ``(site, step)`` — instead of a running draw counter — means a
diverging branch in an imperfect oracle cannot desynchronize the stream:
every draw has a fixed home.

A NumPy oracle mirrors the consumption with the same indexing (see
``tests/_tape.py``).  The per-site trace-order contract is checked at trace
time: ``finalize(expected_sites)`` raises if the kernel consumed a
different number of sites than the builder sized the tape for.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["KernelRNG", "W"]

W = 128


class KernelRNG:
    """Per-kernel randomness: hardware PRNG or injected tape.

    Usage inside a kernel::

        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)  # or tape_ref=None
        rng.seed(seed_ref[0] + pl.program_id(0) * 1000003)
        def body(step, carry):
            rng.begin_step(step)
            a = rng.rbits(5)
            ...
        jax.lax.fori_loop(0, num_steps, body, init)
        rng.finalize(N_SITES)
    """

    def __init__(self, R: int, num_steps: int, tape_ref=None):
        self.R = R
        self.num_steps = num_steps
        self.tape_ref = tape_ref
        self._site = 0
        self._max_sites = 0
        self._step = 0

    # -- lifecycle ---------------------------------------------------------
    def seed(self, seed_scalar) -> None:
        """Seed the hardware PRNG (no-op in tape mode)."""
        if self.tape_ref is None:
            pltpu.prng_seed(seed_scalar)

    def begin_step(self, step) -> None:
        """Mark the start of a loop body; resets the site counter.

        Must be the first ``rng`` call in the body.  Also makes the site
        numbering immune to the body being traced more than once.
        """
        self._step = step
        self._site = 0

    def finalize(self, expected_sites: int) -> None:
        """Trace-time contract check: the body consumed ``expected_sites``
        draw sites per step (the number the tape was sized for)."""
        if self.tape_ref is not None and self._max_sites != expected_sites:
            raise ValueError(
                f"kernel consumed {self._max_sites} draw sites per step but "
                f"the tape was sized for {expected_sites}"
            )

    @staticmethod
    def tape_rows(n_sites: int, num_steps: int, R: int) -> int:
        """Rows of one grid tile's tape slab."""
        return n_sites * num_steps * R

    # -- draws -------------------------------------------------------------
    def draw32(self):
        """One ``[R, W]`` uint32 tile of raw random bits."""
        if self.tape_ref is None:
            return pltpu.prng_random_bits((self.R, W)).astype(jnp.uint32)
        site = self._site
        self._site += 1
        self._max_sites = max(self._max_sites, self._site)
        base = (site * self.num_steps + self._step) * self.R
        return self.tape_ref[pl.ds(base, self.R), :].astype(jnp.uint32)

    def rbits(self, n: int):
        """Uniform int32 in [0, n) — ``u % n`` (bias <= n/2^32, negligible)."""
        return (self.draw32() % n).astype(jnp.int32)

    def r24(self):
        """Uniform int32 in [0, 2^24) — the trainers' epsilon comparand."""
        return (self.draw32() >> 8).astype(jnp.int32)

    def runiform(self):
        """Exact f32 in [0, 1) from the top 24 bits.

        Mosaic can't cast uint32 to f32, so go through int32 (values < 2^24
        stay non-negative)."""
        u = self.draw32() >> 8
        return u.astype(jnp.int32).astype(jnp.float32) * jnp.float32(2.0**-24)

    def rnormal(self):
        """Box-Muller standard normal (two uniform draws)."""
        u1 = jnp.maximum(self.runiform(), jnp.float32(1e-12))
        u2 = self.runiform()
        return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
            jnp.float32(2.0 * np.pi) * u2
        )
