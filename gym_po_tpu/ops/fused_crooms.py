"""Pallas fused multi-step continuous-ROOMS rollout.

Float-state member of the fused family: positions/velocities live as f32
``[R, 128]`` tiles in VMEM; Gaussian action and wall-resample noise are
generated in-kernel with Box-Muller over the hardware PRNG
(``z = sqrt(-2 ln u1) * cos(2 pi u2)``, VPU transcendentals).  Dynamics match
:meth:`CRooms.step_vec` for the continuous ('yx') action type: noisy action
(+ optional velocity integration), position clip, wall test on the
discretized cell, in-cell resample on wall hits (one-ULP boundary clamp),
goal-distance termination, truncation, masked resets at cell centers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.crooms import MAX_VELOCITY
from .kernel_rng import KernelRNG

__all__ = ["make_fused_crooms_rollout"]

W = 128


def _rows_bank(values: np.ndarray, fill) -> np.ndarray:
    n_rows = -(-values.size // W)
    bank = np.full((n_rows, W), fill, values.dtype)
    bank.reshape(-1)[: values.size] = values
    return bank


def make_fused_crooms_rollout(env, num_envs: int, num_steps: int,
                              rows_per_tile: int = 128,
                              interpret: bool = False,
                              episode_stats: bool = False,
                              rng_tape: bool = False):
    """Build ``run(seed, py, px, vy, vx, gy, gx) -> (state'..., reward_sums)``.

    All six state arrays are f32 ``[num_envs // 128, 128]``.
    Supports ``action_type='yx'`` (the continuous default).
    ``episode_stats=True`` appends per-env completed-episode return/length
    sums and counts (in-kernel ``RecordEpisodeStatistics`` analogue).
    ``rng_tape=True`` makes ``run`` take a trailing int32 tape argument of
    shape ``run.tape_shape`` replacing the hardware PRNG (see
    :mod:`gym_po_tpu.ops.kernel_rng`) — the CPU-testable stochastic path.
    """
    if env.action_type != "yx":
        raise ValueError("fused crooms kernel supports action_type='yx'")
    interpret_mode = pltpu.InterpretParams() if interpret else False
    grid_np = env.grid_np
    H, GW = grid_np.shape
    cs = float(env.cell_size)
    std = float(env.action_std)
    power = float(env.action_power)
    use_vel = env.use_velocity
    thr2 = float(env.goal_threshold) ** 2
    step_r, wall_r, goal_r = env.step_reward, env.wall_reward, env.goal_reward
    time_limit = env.time_limit
    pos_hi_y = float(env._pos_hi[0])
    pos_hi_x = float(env._pos_hi[1])

    wall_bank_np = _rows_bank((grid_np.reshape(-1) == -1).astype(np.int32), 1)
    n_wall_rows = wall_bank_np.shape[0]
    valid_cells = np.flatnonzero(grid_np.reshape(-1) >= 0).astype(np.int32)
    n_valid = valid_cells.size
    valid_bank_np = _rows_bank(valid_cells, 0)
    n_valid_rows = valid_bank_np.shape[0]

    fixed_goal = env.fixed_goal_coord  # coords (reference cell_size=1 quirk)
    fg = (float(fixed_goal[0]), float(fixed_goal[1])) if fixed_goal is not None else None
    fixed_agent = env.fixed_agent_coord
    fa = (float(fixed_agent[0]), float(fixed_agent[1])) if fixed_agent is not None else None

    if num_envs % W:
        raise ValueError("num_envs must be a multiple of 128")
    R = min(rows_per_tile, num_envs // W)
    if num_envs % (R * W):
        raise ValueError("num_envs must divide into [rows_per_tile, 128] tiles")
    grid_n = num_envs // (R * W)

    wall_b = jnp.asarray(wall_bank_np)
    valid_b = jnp.asarray(valid_bank_np)

    # draw sites per step, in body-trace order: ay (uniform + 2-draw
    # normal), ax (same), wall-resample ry/rx normals (2 draws each),
    # goal respawn, agent respawn (fixed spawns consume no draw)
    n_sites = 10 + (0 if fg is not None else 1) + (0 if fa is not None else 1)

    def kernel(seed_ref, py_r, px_r, vy_r, vx_r, gy_r, gx_r, wall_r_, valid_r_,
               *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        o_py, o_px, o_vy, o_vx, o_gy, o_gx, rew_ref = outs[:7]
        stat_refs = outs[7:]  # (ep_ret, ep_len, ep_cnt) when episode_stats
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        # large-prime stride keeps tile streams disjoint across nearby seeds
        rng.seed(seed_ref[0] + pl.program_id(0) * 1000003)
        rbits, runiform, rnormal = rng.rbits, rng.runiform, rng.rnormal

        def shuffle(lane_idx, row):
            return jnp.take_along_axis(
                jnp.broadcast_to(row, (R, W)), lane_idx, axis=1
            )

        def bank_gather(idx, bank_ref, n_rows):
            lane = idx % W
            row = idx // W
            out = shuffle(lane, bank_ref[0:1, :])
            for r in range(1, n_rows):
                out = jnp.where(row == r, shuffle(lane, bank_ref[r : r + 1, :]), out)
            return out

        def sample_coords(fixed):
            if fixed is not None:
                return (
                    jnp.full((R, W), fixed[0], jnp.float32),
                    jnp.full((R, W), fixed[1], jnp.float32),
                )
            cell = bank_gather(rbits(n_valid), valid_r_, n_valid_rows)
            # cell center with implicit cell_size=1 (reference quirk,
            # crooms.py:240-244)
            cy = (cell // GW).astype(jnp.float32) + 0.5
            cx = (cell % GW).astype(jnp.float32) + 0.5
            return cy, cx

        def wall_at(y, x):
            cyi = jnp.floor(y / cs).astype(jnp.int32)
            cxi = jnp.floor(x / cs).astype(jnp.int32)
            return bank_gather(cyi * GW + cxi, wall_r_, n_wall_rows) == 1

        def body(step, carry):
            py, px, vy, vx, gy, gx, elapsed, racc, stats = carry
            rng.begin_step(step)
            ay = (runiform() * 2.0 - 1.0 + rnormal() * std) * power
            ax = (runiform() * 2.0 - 1.0 + rnormal() * std) * power
            if use_vel:
                vy2 = jnp.clip(vy + ay, -MAX_VELOCITY, MAX_VELOCITY)
                vx2 = jnp.clip(vx + ax, -MAX_VELOCITY, MAX_VELOCITY)
                ny = py + vy2
                nx = px + vx2
            else:
                vy2, vx2 = vy, vx
                ny = py + ay
                nx = px + ax
            ny = jnp.clip(ny, 0.0, jnp.float32(pos_hi_y))
            nx = jnp.clip(nx, 0.0, jnp.float32(pos_hi_x))
            oob = wall_at(ny, nx)
            # wall hit: resample within the CURRENT cell, zero velocity
            ceny = jnp.floor(py / cs) * cs + cs / 2
            cenx = jnp.floor(px / cs) * cs + cs / 2
            hiy = jnp.nextafter(ceny + cs / 2, jnp.float32(0.0))
            hix = jnp.nextafter(cenx + cs / 2, jnp.float32(0.0))
            # NOTE: both resample normals are drawn every step (fixed draw
            # structure) even though they only land on wall hits
            ry = jnp.clip(ceny + rnormal() * 0.5, ceny - cs / 2, hiy)
            rx = jnp.clip(cenx + rnormal() * 0.5, cenx - cs / 2, hix)
            py2 = jnp.where(oob, ry, ny)
            px2 = jnp.where(oob, rx, nx)
            vy3 = jnp.where(oob, 0.0, vy2)
            vx3 = jnp.where(oob, 0.0, vx2)
            dy = py2 - gy
            dx = px2 - gx
            done = dy * dy + dx * dx <= jnp.float32(thr2)
            rew = jnp.where(
                done,
                jnp.float32(goal_r),
                jnp.where(oob, jnp.float32(wall_r), jnp.float32(step_r)),
            )
            elapsed = elapsed + 1
            trunc = elapsed > time_limit
            reset = done | trunc
            if episode_stats:
                cur_ret, ep_ret, ep_len, ep_cnt = stats
                cur_ret = cur_ret + rew
                ep_ret = jnp.where(reset, ep_ret + cur_ret, ep_ret)
                ep_len = jnp.where(
                    reset, ep_len + elapsed.astype(jnp.float32), ep_len
                )
                ep_cnt = jnp.where(reset, ep_cnt + 1.0, ep_cnt)
                cur_ret = jnp.where(reset, 0.0, cur_ret)
                stats = (cur_ret, ep_ret, ep_len, ep_cnt)
            ngy, ngx = sample_coords(fg)
            nay, nax = sample_coords(fa)
            gy2 = jnp.where(reset, ngy, gy)
            gx2 = jnp.where(reset, ngx, gx)
            py3 = jnp.where(reset, nay, py2)
            px3 = jnp.where(reset, nax, px2)
            vy4 = jnp.where(reset, 0.0, vy3)
            vx4 = jnp.where(reset, 0.0, vx3)
            elapsed = jnp.where(reset, 0, elapsed)
            return (py3, px3, vy4, vx4, gy2, gx2, elapsed, racc + rew, stats)

        zi = jnp.zeros((R, W), jnp.int32)
        zf = jnp.zeros((R, W), jnp.float32)
        py, px, vy, vx, gy, gx, _, racc, stats = jax.lax.fori_loop(
            0, num_steps, body,
            (py_r[:], px_r[:], vy_r[:], vx_r[:], gy_r[:], gx_r[:], zi,
             zf, (zf, zf, zf, zf)),
        )
        rng.finalize(n_sites)
        o_py[:] = py
        o_px[:] = px
        o_vy[:] = vy
        o_vx[:] = vx
        o_gy[:] = gy
        o_gx[:] = gx
        rew_ref[:] = racc
        if episode_stats:
            stat_refs[0][:] = stats[1]
            stat_refs[1][:] = stats[2]
            stat_refs[2][:] = stats[3]

    spec = pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(memory_space=pltpu.VMEM)
    rows_total = num_envs // W
    f32 = jax.ShapeDtypeStruct((rows_total, W), jnp.float32)
    n_out = 7 + (3 if episode_stats else 0)
    slab = KernelRNG.tape_rows(n_sites, num_steps, R)
    tape_specs = (
        [pl.BlockSpec((slab, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        if rng_tape else []
    )

    @jax.jit
    def run(seed, py, px, vy, vx, gy, gx, *tape):
        if rng_tape and tuple(tape[0].shape) != (grid_n * slab, W):
            raise ValueError(
                f"rng tape must have shape {(grid_n * slab, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            grid=(grid_n,),
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [spec] * 6
            + [tab] * 2
            + tape_specs,
            out_specs=(spec,) * n_out,
            out_shape=(f32,) * n_out,
        )(seed, py, px, vy, vx, gy, gx, wall_b, valid_b, *tape)

    run.tape_shape = (grid_n * slab, W)
    run.n_sites = n_sites
    return run
