"""Smooth rigid-body dynamics for the ant: FK, Jacobians, CRBA, bias.

TPU-first formulation: instead of Featherstone's sequential body-frame
recursions, everything is phrased over *world-frame, CoM-anchored* body
Jacobians ``J ∈ [nb, nv, 3]`` so the mass matrix and bias force become a
handful of batched einsums (MXU work under vmap) with no sequential
dependency beyond the depth-2 kinematic tree:

* ``M = Σ_b m_b Jp_bᵀ Jp_b + Jr_bᵀ I_b^w Jr_b + diag(armature)`` —
  algebraically identical to CRBA (MuJoCo ``mj_crb``).
* ``qfrc_bias = Σ_b Jp_bᵀ m_b (a_b − g) + Jr_bᵀ (I^w α_b + ω×I^w ω)`` with
  ``(a, α) = J̇ q̇`` computed analytically — identical to RNEA with q̈ = 0
  (MuJoCo ``mj_rne``), gravity included like MuJoCo's ``qfrc_bias``.

Free-joint conventions follow MuJoCo (verified empirically against
``mj_objectVelocity`` / ``mj_jacBodyCom``): linear qvel is world-frame,
angular qvel is body-frame, rotation dofs are anchored at the torso frame
origin.  All functions are single-env and f32/f64-polymorphic; batch with
``jax.vmap``.  Parity: ``tests/test_physics.py`` checks xpos/xquat/Jacobians/
``mj_fullM``/``qfrc_bias``/``qacc_smooth`` against MuJoCo at random states.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .ant_model import AntModel
from .linalg import chol_solve
from .spatial import axis_angle_quat, quat_mul, quat_normalize, quat_to_mat

__all__ = ["Kinematics", "fk", "dof_frames", "body_jacobians",
           "point_jacobian", "mass_matrix", "bias_force", "smooth_forward"]


class Kinematics(NamedTuple):
    """World-frame pose/velocity data reused across M, bias, and contacts."""

    xpos: jnp.ndarray      # [nb,3] body frame origins
    xquat: jnp.ndarray     # [nb,4]
    xmat: jnp.ndarray      # [nb,3,3]
    com: jnp.ndarray       # [nb,3] body CoM, world
    inertia_w: jnp.ndarray  # [nb,3,3] body inertia about CoM, world axes
    dof_u: jnp.ndarray     # [nv,3] rotation axis per dof (zeros for trans)
    dof_p: jnp.ndarray     # [nv,3] anchor point per dof
    trans: jnp.ndarray     # [nv] 1.0 for the 3 free translation dofs
    jp: jnp.ndarray        # [nb,nv,3] CoM linear Jacobian
    jr: jnp.ndarray        # [nb,nv,3] angular Jacobian


def fk(model: AntModel, qpos: jnp.ndarray):
    """Forward kinematics → (xpos [nb,3], xquat [nb,4]).

    The 13-body tree is unrolled in topological order (depth 2), so under
    jit this is straight-line code with no scan.
    """
    dtype = qpos.dtype
    root_q = quat_normalize(qpos[3:7])
    xpos = [qpos[0:3]]
    xquat = [root_q]
    for b in range(1, model.nb):
        p = int(model.parent[b])
        off = jnp.asarray(model.body_pos[b], dtype=dtype)
        Rp = quat_to_mat(xquat[p])
        pos = xpos[p] + Rp @ off
        j = int(model.body_jnt[b])
        if j >= 0:
            ax = jnp.asarray(model.jnt_axis[j], dtype=dtype)
            ang = qpos[int(model.jnt_qpos[j])]
            q = quat_mul(xquat[p], axis_angle_quat(ax * ang))
        else:
            q = xquat[p]
        xpos.append(pos)
        xquat.append(q)
    return jnp.stack(xpos), jnp.stack(xquat)


def dof_frames(model: AntModel, xpos, xmat):
    """Per-dof world rotation axis ``u`` and anchor ``p`` (+ translation
    mask).  Free rotation dofs: torso frame axes anchored at the torso
    origin; hinge dofs: child-frame axis anchored at the child origin."""
    dtype = xpos.dtype
    nv = model.nv
    u = jnp.zeros((nv, 3), dtype)
    p = jnp.zeros((nv, 3), dtype)
    trans = jnp.zeros((nv,), dtype).at[:3].set(1.0)
    u = u.at[3:6].set(xmat[0].T)  # columns of R_torso
    p = p.at[3:6].set(xpos[0])
    child = model.jnt_body
    ax = jnp.einsum(
        "jik,jk->ji", xmat[child], jnp.asarray(model.jnt_axis, dtype=dtype)
    )
    u = u.at[model.jnt_dof].set(ax)
    p = p.at[model.jnt_dof].set(xpos[child])
    return u, p, trans


def body_jacobians(model: AntModel, com, u, p, trans):
    """CoM-anchored world Jacobians (jp, jr) of every body, [nb,nv,3]."""
    dtype = com.dtype
    mask = jnp.asarray(model.dof_mask, dtype=dtype)[:, :, None]  # [nb,nv,1]
    eye = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((model.nv - 3, 3), dtype)]
    )  # [nv,3] translation columns
    arm = com[:, None, :] - p[None, :, :]                 # [nb,nv,3]
    rot_p = jnp.cross(u[None, :, :], arm)                 # u × (c - p)
    t = trans[None, :, None]
    jp = mask * (t * eye[None] + (1.0 - t) * rot_p)
    jr = mask * (1.0 - t) * u[None, :, :]
    return jp, jr


def point_jacobian(model: AntModel, kin: Kinematics, body: jnp.ndarray,
                   point: jnp.ndarray):
    """Linear Jacobian [..., nv, 3] of world point(s) on given body id(s).

    ``body`` [...] int, ``point`` [..., 3].  Used for contact rows.
    """
    dtype = point.dtype
    mask = jnp.asarray(model.dof_mask, dtype=dtype)[body][..., None]
    eye = jnp.concatenate(
        [jnp.eye(3, dtype=dtype), jnp.zeros((model.nv - 3, 3), dtype)]
    )
    arm = point[..., None, :] - kin.dof_p                 # [...,nv,3]
    rot_p = jnp.cross(kin.dof_u, arm)
    t = kin.trans[:, None]
    return mask * (t * eye + (1.0 - t) * rot_p)


def kinematics(model: AntModel, qpos: jnp.ndarray) -> Kinematics:
    xpos, xquat = fk(model, qpos)
    xmat = quat_to_mat(xquat)
    dtype = qpos.dtype
    com = xpos + jnp.einsum(
        "bij,bj->bi", xmat, jnp.asarray(model.body_ipos, dtype=dtype)
    )
    inertia_w = jnp.einsum(
        "bij,bjk,blk->bil",
        xmat, jnp.asarray(model.body_inertia, dtype=dtype), xmat,
    )
    u, p, trans = dof_frames(model, xpos, xmat)
    jp, jr = body_jacobians(model, com, u, p, trans)
    return Kinematics(xpos, xquat, xmat, com, inertia_w, u, p, trans, jp, jr)


def mass_matrix(model: AntModel, kin: Kinematics) -> jnp.ndarray:
    """Joint-space inertia [nv,nv] (== MuJoCo ``mj_fullM``)."""
    dtype = kin.com.dtype
    m = jnp.asarray(model.body_mass, dtype=dtype)
    M = jnp.einsum("b,bdi,bei->de", m, kin.jp, kin.jp)
    M = M + jnp.einsum("bdi,bij,bej->de", kin.jr, kin.inertia_w, kin.jr)
    return M + jnp.diag(jnp.asarray(model.armature, dtype=dtype))


def bias_force(model: AntModel, kin: Kinematics,
               qvel: jnp.ndarray) -> jnp.ndarray:
    """Coriolis + centrifugal + gravity generalized force (``qfrc_bias``)."""
    dtype = qvel.dtype
    m = jnp.asarray(model.body_mass, dtype=dtype)
    cdot = jnp.einsum("bdi,d->bi", kin.jp, qvel)     # CoM velocities
    omega = jnp.einsum("bdi,d->bi", kin.jr, qvel)    # angular velocities

    # time derivatives of the per-dof frames: the axis of dof d rotates with
    # its anchor body (torso for free rot dofs, hinge child otherwise) and
    # the anchor point translates with that body
    anchor_body = jnp.zeros((model.nv,), dtype=jnp.int32)
    anchor_body = anchor_body.at[model.jnt_dof].set(
        jnp.asarray(model.jnt_body, dtype=jnp.int32)
    )
    w_a = omega[anchor_body]                          # [nv,3]
    udot = jnp.cross(w_a, kin.dof_u)
    pdot = cdot[anchor_body] + jnp.cross(
        w_a, kin.dof_p - kin.com[anchor_body]
    )

    mask = jnp.asarray(model.dof_mask, dtype=dtype)   # [nb,nv]
    rot = (1.0 - kin.trans)[None, :, None]
    arm = kin.com[:, None, :] - kin.dof_p[None]
    # (J̇ q̇) per body: linear and angular acceleration with q̈ = 0
    dcol_p = rot * (
        jnp.cross(udot[None], arm)
        + jnp.cross(kin.dof_u[None], cdot[:, None, :] - pdot[None])
    )
    a_lin = jnp.einsum("bd,bdi,d->bi", mask, dcol_p, qvel)
    a_ang = jnp.einsum("bd,bdi,d->bi", mask, rot * udot[None], qvel)

    g = jnp.asarray([0.0, 0.0, model.gravity], dtype=dtype)
    f_lin = m[:, None] * (a_lin - g)
    iw = kin.inertia_w
    f_ang = jnp.einsum("bij,bj->bi", iw, a_ang) + jnp.cross(
        omega, jnp.einsum("bij,bj->bi", iw, omega)
    )
    return jnp.einsum("bdi,bi->d", kin.jp, f_lin) + jnp.einsum(
        "bdi,bi->d", kin.jr, f_ang
    )


def actuation(model: AntModel, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Generalized force from gear-15 torque motors (ctrl clamped to ±1)."""
    tau = jnp.zeros((model.nv,), dtype=ctrl.dtype)
    return tau.at[model.act_dof].set(model.gear * jnp.clip(ctrl, -1.0, 1.0))


def passive_force(model: AntModel, qvel: jnp.ndarray) -> jnp.ndarray:
    return -jnp.asarray(model.damping, dtype=qvel.dtype) * qvel


def smooth_forward(model: AntModel, qpos, qvel, ctrl):
    """Unconstrained dynamics → (kin, M, qacc_smooth, qfrc_smooth).

    ``qacc_smooth`` matches MuJoCo's ``mjData.qacc_smooth``.
    """
    kin = kinematics(model, qpos)
    M = mass_matrix(model, kin)
    tau = actuation(model, ctrl) + passive_force(model, qvel)
    qfrc = tau - bias_force(model, kin, qvel)
    qacc = chol_solve(M, qfrc)
    return kin, M, qacc, qfrc
