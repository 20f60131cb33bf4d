"""Forward dynamics + RK4 integration — the TPU ant simulator's outer loop.

Mirrors MuJoCo's pipeline (``mj_forward`` → ``mj_RungeKutta``), reference
substrate for ``gym_po/envs/ant_tag.py:138-158``:

* ``forward`` = smooth dynamics (:mod:`.dynamics`) + constraint solve
  (:mod:`.contact`), returning ``qacc``.
* ``rk4_step`` = the classic 4-stage tableau on the qpos manifold: stage
  positions integrate the *averaged stage velocities* from the step's start
  via the quaternion exponential map, exactly like ``mj_RungeKutta`` +
  ``mj_integratePos``.
* ``step`` = ``frame_skip`` RK4 steps with the control held (the envs use
  frame_skip=15 → dt_env = 0.3 s), rolled with ``lax.scan``.

Constraint forces are warm-started across stages and frames (slot-aligned
top-K; misalignment after contact-set changes only affects the APGD start
point, never the fixed point).  Everything is single-env and pure; batch
with ``jax.vmap`` — under vmap the per-stage 14×14 Cholesky and the
[ne,ne] APGD matvecs become batched MXU work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ant_model import AntModel
from .contact import NUM_CONTACT_SLOTS, constraint_rows, solve_constraints
from .dynamics import smooth_forward
from .spatial import quat_integrate, quat_normalize

__all__ = ["PhysicsState", "init_state", "forward", "rk4_step", "step"]

_NE = 8 + 4 * NUM_CONTACT_SLOTS


class PhysicsState(NamedTuple):
    qpos: jnp.ndarray    # [nq]
    qvel: jnp.ndarray    # [nv]
    f_warm: jnp.ndarray  # [ne] constraint-force warm start


def init_state(model: AntModel, qpos, qvel) -> PhysicsState:
    qpos = jnp.asarray(qpos)
    return PhysicsState(
        qpos, jnp.asarray(qvel, qpos.dtype),
        jnp.zeros((_NE,), qpos.dtype),
    )


def forward(model: AntModel, qpos, qvel, ctrl, f_warm=None,
            iters: int = 250):
    """Constrained forward dynamics → (qacc, f)."""
    kin, M, qacc_smooth, _ = smooth_forward(model, qpos, qvel, ctrl)
    rows = constraint_rows(model, kin, qpos, qvel)
    if f_warm is None:
        f_warm = jnp.zeros((rows.jac.shape[0],), qpos.dtype)
    return solve_constraints(model, M, qacc_smooth, rows, iters=iters,
                             f0=f_warm)


def _integrate_pos(model: AntModel, qpos, qvel_avg, dt):
    """MuJoCo ``mj_integratePos``: linear position + local-frame quaternion
    exponential + hinge angles."""
    pos = qpos[0:3] + dt * qvel_avg[0:3]
    quat = quat_normalize(quat_integrate(qpos[3:7], qvel_avg[3:6], dt))
    hinges = qpos[7:] + dt * qvel_avg[6:]
    return jnp.concatenate([pos, quat, hinges])


_RK_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def rk4_step(model: AntModel, state: PhysicsState, ctrl,
             iters: int = 250) -> PhysicsState:
    """One RK4 step of length ``model.dt`` (== ``mj_RungeKutta(m, d, 4)``)."""
    dt = model.dt
    qpos0, qvel0 = state.qpos, state.qvel
    qacc, f = forward(model, qpos0, qvel0, ctrl, state.f_warm, iters)
    vels = [qvel0]
    accs = [qacc]
    for i in range(3):
        a_row = _RK_A[i]
        dvel = sum(a_row[j] * accs[j] for j in range(i + 1))
        dpos_vel = sum(a_row[j] * vels[j] for j in range(i + 1))
        qpos_i = _integrate_pos(model, qpos0, dpos_vel, dt)
        qvel_i = qvel0 + dt * dvel
        qacc_i, f = forward(model, qpos_i, qvel_i, ctrl, f, iters)
        vels.append(qvel_i)
        accs.append(qacc_i)
    vel_avg = sum(b * v for b, v in zip(_RK_B, vels))
    acc_avg = sum(b * a for b, a in zip(_RK_B, accs))
    return PhysicsState(
        _integrate_pos(model, qpos0, vel_avg, dt),
        qvel0 + dt * acc_avg,
        f,
    )


def step(model: AntModel, state: PhysicsState, ctrl, frame_skip: int = 15,
         iters: int = 250) -> PhysicsState:
    """``frame_skip`` RK4 steps with ``ctrl`` held (``MujocoEnv.do_simulation``)."""

    def body(s, _):
        return rk4_step(model, s, ctrl, iters), ()

    out, _ = jax.lax.scan(body, state, None, length=frame_skip)
    return out
