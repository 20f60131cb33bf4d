"""Pallas fused multi-step rollouts for the JAX ant-task surrogates.

TagContinuous is the most randomness-hungry env in the suite (21 per-env
draws per step: 2 action, 1 flee mode, 2 agent spawn, 16 target-candidate
spawn), which makes the scan path PRNG-dispatch-bound (~88M steps/s at
B=64k).  Keeping the four f32 state tiles resident in VMEM and drawing all
randomness with the hardware PRNG amortizes that completely — the same
design win as :mod:`.fused_crooms`.

Semantics match :meth:`TagContinuous.step_vec` / :meth:`HeavenHellContinuous.
step_vec` under the uniform-random policy (task constants from reference
``ant_tag.py:27-158`` and ``ant_heaven_hell.py:29-137``): clipped point-mass
moves, the target's {away, two orthogonals, stay} flee rule cancelled at the
cage edge, tag/terminal radii, 8-candidate >= 5.0 target spawn with the
farthest-corner fallback, T-maze free-space clamp, priest-revealed heaven.
Like the rest of the fused family the kernels are *stats-matched* (not
bit-exact) against the scan path — they draw from the hardware PRNG, not
threefry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..envs.tag_jax import (
    BAR,
    CAGE,
    HH_SITES,
    HH_RADIUS,
    MIN_SPAWN_DIST,
    STEM,
    TAG_RADIUS,
    TARGET_STEP,
)
from .kernel_rng import KernelRNG

__all__ = ["make_fused_tag_rollout", "make_fused_heavenhell_rollout"]

W = 128

_CORNERS = np.array(
    [[-CAGE, -CAGE], [-CAGE, CAGE], [CAGE, -CAGE], [CAGE, CAGE]], np.float32
)


def _tiling(num_envs: int, rows_per_tile: int):
    if num_envs % W:
        raise ValueError("num_envs must be a multiple of 128")
    R = min(rows_per_tile, num_envs // W)
    if num_envs % (R * W):
        raise ValueError("num_envs must divide into [rows_per_tile, 128] tiles")
    return R, num_envs // (R * W)


def make_fused_tag_rollout(env, num_envs: int, num_steps: int,
                           rows_per_tile: int = 128,
                           interpret: bool = False,
                           episode_stats: bool = False,
                           rng_tape: bool = False):
    """Build ``run(seed, a0, a1, t0, t1) -> (a0', a1', t0', t1', reward_sums)``.

    All five arrays are f32 ``[num_envs // 128, 128]`` (agent xy, target xy
    component tiles; reward sums accumulated over ``num_steps``).
    ``episode_stats=True`` appends per-env completed-episode return/length
    sums and counts (in-kernel ``RecordEpisodeStatistics`` analogue).
    ``rng_tape=True`` makes ``run`` take a trailing int32 tape argument of
    shape ``run.tape_shape`` replacing the hardware PRNG (see
    :mod:`gym_po_tpu.ops.kernel_rng`) — the CPU-testable stochastic path.
    """
    interpret_mode = pltpu.InterpretParams() if interpret else False
    R, grid_n = _tiling(num_envs, rows_per_tile)
    speed = float(env.agent_speed)
    time_limit = int(env.time_limit)
    # draw sites per step, in body-trace order: 2 agent-move uniforms, flee
    # mode, respawn agent xy (2), respawn target candidates (8 x 2)
    n_sites = 21

    def kernel(seed_ref, a0_r, a1_r, t0_r, t1_r, *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        o_a0, o_a1, o_t0, o_t1, rew_ref = outs[:5]
        stat_refs = outs[5:]  # (ep_ret, ep_len, ep_cnt) when episode_stats
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        rng.seed(seed_ref[0] + pl.program_id(0) * 1000003)
        rbits, runiform = rng.rbits, rng.runiform

        def rcage():
            return runiform() * jnp.float32(2 * CAGE) - jnp.float32(CAGE)

        def spawn_target(a0, a1):
            """8 uniform candidates, first with dist >= MIN_SPAWN_DIST wins;
            farthest cage corner as the always-valid fallback (>= 6.3)."""
            # farthest corner per env (4 static corners, running max)
            fc0 = jnp.full((R, W), _CORNERS[0, 0], jnp.float32)
            fc1 = jnp.full((R, W), _CORNERS[0, 1], jnp.float32)
            best = (fc0 - a0) ** 2 + (fc1 - a1) ** 2
            for c0, c1 in _CORNERS[1:]:
                d = (c0 - a0) ** 2 + (c1 - a1) ** 2
                better = d > best
                fc0 = jnp.where(better, c0, fc0)
                fc1 = jnp.where(better, c1, fc1)
                best = jnp.maximum(best, d)
            out0, out1 = fc0, fc1
            found = jnp.zeros((R, W), jnp.bool_)
            for _ in range(8):
                c0 = rcage()
                c1 = rcage()
                ok = (c0 - a0) ** 2 + (c1 - a1) ** 2 >= jnp.float32(
                    MIN_SPAWN_DIST**2
                )
                pick = ok & ~found
                out0 = jnp.where(pick, c0, out0)
                out1 = jnp.where(pick, c1, out1)
                found = found | ok
            return out0, out1

        def body(step, carry):
            a0, a1, t0, t1, elapsed, racc, stats = carry
            rng.begin_step(step)
            # agent: clipped point-mass move under the uniform-random policy
            a0 = jnp.clip(a0 + (runiform() * 2.0 - 1.0) * speed, -CAGE, CAGE)
            a1 = jnp.clip(a1 + (runiform() * 2.0 - 1.0) * speed, -CAGE, CAGE)
            # target flee rule (reference ant_tag.py:105-123)
            mode = rbits(4)
            w0 = t0 - a0
            w1 = t1 - a1
            nrm = jnp.sqrt(w0 * w0 + w1 * w1)
            inv = jnp.where(nrm > 1e-9, 1.0 / jnp.maximum(nrm, 1e-9), 0.0)
            u0 = w0 * inv
            u1 = w1 * inv
            s0 = jnp.where(
                mode == 0, u0, jnp.where(mode == 1, -u1, jnp.where(mode == 2, u1, 0.0))
            )
            s1 = jnp.where(
                mode == 0, u1, jnp.where(mode == 1, u0, jnp.where(mode == 2, -u0, 0.0))
            )
            n0 = t0 + s0 * jnp.float32(TARGET_STEP)
            n1 = t1 + s1 * jnp.float32(TARGET_STEP)
            oc = (jnp.abs(n0) > CAGE) | (jnp.abs(n1) > CAGE)
            t0 = jnp.where(oc, t0, n0)
            t1 = jnp.where(oc, t1, n1)
            d2 = (a0 - t0) ** 2 + (a1 - t1) ** 2
            done = d2 <= jnp.float32(TAG_RADIUS**2)
            rew = done.astype(jnp.float32)
            elapsed = elapsed + 1
            reset = done | (elapsed >= time_limit)
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
            na0 = rcage()
            na1 = rcage()
            nt0, nt1 = spawn_target(na0, na1)
            a0 = jnp.where(reset, na0, a0)
            a1 = jnp.where(reset, na1, a1)
            t0 = jnp.where(reset, nt0, t0)
            t1 = jnp.where(reset, nt1, t1)
            elapsed = jnp.where(reset, 0, elapsed)
            return (a0, a1, t0, t1, elapsed, racc + rew, stats)

        zf = jnp.zeros((R, W), jnp.float32)
        a0, a1, t0, t1, _, racc, stats = jax.lax.fori_loop(
            0, num_steps, body,
            (a0_r[:], a1_r[:], t0_r[:], t1_r[:], jnp.zeros((R, W), jnp.int32),
             zf, (zf, zf, zf, zf)),
        )
        rng.finalize(n_sites)
        o_a0[:] = a0
        o_a1[:] = a1
        o_t0[:] = t0
        o_t1[:] = t1
        rew_ref[:] = racc
        if episode_stats:
            stat_refs[0][:] = stats[1]
            stat_refs[1][:] = stats[2]
            stat_refs[2][:] = stats[3]

    spec = pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((num_envs // W, W), jnp.float32)
    n_out = 5 + (3 if episode_stats else 0)
    slab = KernelRNG.tape_rows(n_sites, num_steps, R)
    tape_specs = (
        [pl.BlockSpec((slab, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        if rng_tape else []
    )

    @jax.jit
    def run(seed, a0, a1, t0, t1, *tape):
        if rng_tape and tuple(tape[0].shape) != (grid_n * slab, W):
            raise ValueError(
                f"rng tape must have shape {(grid_n * slab, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            grid=(grid_n,),
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 4
            + tape_specs,
            out_specs=(spec,) * n_out,
            out_shape=(f32,) * n_out,
        )(seed, a0, a1, t0, t1, *tape)

    run.tape_shape = (grid_n * slab, W)
    run.n_sites = n_sites
    return run


def make_fused_heavenhell_rollout(env, num_envs: int, num_steps: int,
                                  rows_per_tile: int = 128,
                                  interpret: bool = False,
                                  episode_stats: bool = False,
                                  rng_tape: bool = False):
    """Build ``run(seed, x, y, heaven) -> (x', y', heaven', reward_sums)``.

    ``x``/``y``/``reward_sums`` are f32 tiles, ``heaven`` is an int32 tile
    (1 = heaven on the +x side this episode).
    ``episode_stats=True`` appends per-env completed-episode return/length
    sums and counts (in-kernel ``RecordEpisodeStatistics`` analogue).
    ``rng_tape=True`` makes ``run`` take a trailing int32 tape argument of
    shape ``run.tape_shape`` replacing the hardware PRNG (see
    :mod:`gym_po_tpu.ops.kernel_rng`) — the CPU-testable stochastic path.
    """
    interpret_mode = pltpu.InterpretParams() if interpret else False
    R, grid_n = _tiling(num_envs, rows_per_tile)
    speed = float(env.agent_speed)
    time_limit = int(env.time_limit)
    hx, hy = float(HH_SITES[0, 0]), float(HH_SITES[0, 1])  # heaven-left site
    r2 = float(HH_RADIUS**2)
    # draw sites per step, in body-trace order: 2 move uniforms, respawn
    # x/y uniforms, heaven coin
    n_sites = 5

    def kernel(seed_ref, x_r, y_r, h_r, *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        o_x, o_y, o_h, rew_ref = outs[:4]
        stat_refs = outs[4:]  # (ep_ret, ep_len, ep_cnt) when episode_stats
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        rng.seed(seed_ref[0] + pl.program_id(0) * 1000003)
        runiform = rng.runiform

        def rbit():
            return (rng.draw32() & 1).astype(jnp.int32)

        def in_free(x, y):
            stem = (x >= STEM[0]) & (x <= STEM[1]) & (y >= STEM[2]) & (y <= STEM[3])
            bar = (x >= BAR[0]) & (x <= BAR[1]) & (y >= BAR[2]) & (y <= BAR[3])
            return stem | bar

        def body(step, carry):
            x, y, h, elapsed, racc, stats = carry
            rng.begin_step(step)
            px = x + (runiform() * 2.0 - 1.0) * speed
            py = y + (runiform() * 2.0 - 1.0) * speed
            ok = in_free(px, py)
            x = jnp.where(ok, px, x)
            y = jnp.where(ok, py, y)
            dl = (x - hx) ** 2 + (y - hy) ** 2
            dr = (x + hx) ** 2 + (y - hy) ** 2  # right site = (-hx, hy) mirrored
            at_left = dl <= r2
            at_right = dr <= r2
            done = at_left | at_right
            # boolean algebra, not where-on-bools: Mosaic rejects i1 selects
            right_side = h == 1
            reached = (right_side & at_right) | (~right_side & at_left)
            rew = jnp.where(done, jnp.where(reached, 1.0, -1.0), 0.0).astype(
                jnp.float32
            )
            elapsed = elapsed + 1
            reset = done | (elapsed >= time_limit)
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
            # spawn: x ~ U(-1,1), y ~ U(0,1), fair heaven coin
            nx = runiform() * 2.0 - 1.0
            ny = runiform()
            nh = rbit()
            x = jnp.where(reset, nx, x)
            y = jnp.where(reset, ny, y)
            h = jnp.where(reset, nh, h)
            elapsed = jnp.where(reset, 0, elapsed)
            return (x, y, h, elapsed, racc + rew, stats)

        zf = jnp.zeros((R, W), jnp.float32)
        x, y, h, _, racc, stats = jax.lax.fori_loop(
            0, num_steps, body,
            (x_r[:], y_r[:], h_r[:], jnp.zeros((R, W), jnp.int32),
             zf, (zf, zf, zf, zf)),
        )
        rng.finalize(n_sites)
        o_x[:] = x
        o_y[:] = y
        o_h[:] = h
        rew_ref[:] = racc
        if episode_stats:
            stat_refs[0][:] = stats[1]
            stat_refs[1][:] = stats[2]
            stat_refs[2][:] = stats[3]

    spec = pl.BlockSpec((R, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rows_total = num_envs // W
    f32 = jax.ShapeDtypeStruct((rows_total, W), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows_total, W), jnp.int32)
    n_extra = 3 if episode_stats else 0
    slab = KernelRNG.tape_rows(n_sites, num_steps, R)
    tape_specs = (
        [pl.BlockSpec((slab, W), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        if rng_tape else []
    )

    @jax.jit
    def run(seed, x, y, h, *tape):
        if rng_tape and tuple(tape[0].shape) != (grid_n * slab, W):
            raise ValueError(
                f"rng tape must have shape {(grid_n * slab, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            grid=(grid_n,),
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 3
            + tape_specs,
            out_specs=(spec,) * (4 + n_extra),
            out_shape=(f32, f32, i32, f32) + (f32,) * n_extra,
        )(seed, x, y, h, *tape)

    run.tape_shape = (grid_n * slab, W)
    run.n_sites = n_sites
    return run
