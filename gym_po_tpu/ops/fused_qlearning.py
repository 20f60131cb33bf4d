"""Pallas fused tabular Q-learning: the WHOLE trainer inside one TPU kernel.

The XLA scan-of-scans Q-learning (`agents/qlearning.py`) already runs at
221M transitions/s (B=64k); its remaining cost is HBM round-trips of the
one-hot operand buffers every step.  This kernel keeps everything — env
state tiles, the transition tables, AND the Q-table — resident in VMEM for
K steps: epsilon-greedy acting, the taxi transition (reference
``extended_taxi.py:244-287`` semantics, same as :mod:`.fused_taxi`), TD
targets from the PRE-reset terminal state, and the duplicate-accumulating
``Q[s,a] += lr*td`` update, all on-core.

The update is the hard part: TPUs have no scatter.  Per 128-env row we
build two mask matrices with iota-compares and route the scatter through
the MXU as ``C += X' @ P'ᵀ`` (``X'[h,e] = 1[hi_e==h]·td_e`` ``[32,128]``,
``P'[l,e] = 1[lo_e==l]`` ``[128,128]``, dot_general contracting the env
axis at ``Precision.HIGHEST`` — the default MXU f32 mode rounds ``td``
operands through bf16), then ``Q += lr·C`` once per step.

Q-table layout: entry ``(s, a)`` lives at bank ``hi = a·(NSP/128) + s>>7``,
lane ``lo = s&127`` of a ``[32, 128]`` f32 VMEM tile (NSP = ns padded to a
multiple of 128).  Lookups are plain lane shuffles per bank — exact, no
matmul rounding.

Like the rest of the fused family the kernels draw from the hardware PRNG
(stats-matched, not bit-exact, vs the threefry scan path).  Three trainers
share the machinery: taxi on both maps (classic and extended 8x8 —
per-action move banks, interior-wall reset bank, ns up to 1280 via
``bank_geometry``; fully-observable and Hansen-POMDP Q indexing), ROOMS
with a fixed goal (Q indexed by ANY discrete observation model via a
precomputed per-cell obs table), and MultistoryFourRooms (3-D cells +
in-kernel stair transit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_rng import KernelRNG

__all__ = [
    "make_fused_q_trainer",
    "make_fused_q_trainer_rooms",
    "make_fused_q_trainer_msrooms",
]

W = 128
NB = 32  # default Q bank rows: 5 actions x (512/128) obs banks = 20, pad 32
NSB = 4  # default obs banks per action (512 / 128)


def bank_geometry(idx_n: int, n_act: int):
    """(nsb, nb): obs banks per action and total bank rows (8-aligned,
    min 32 for compatibility with the fixed-shape kernels) for an
    ``idx_n``-entry index space."""
    # floor at the default stride so every index space <= 512 keeps the
    # canonical [32, 128] layout q_to_banks/banks_to_q default to
    nsb = max(NSB, -(-idx_n // W))
    nb = max(NB, -(-(n_act * nsb) // 8) * 8)
    return nsb, nb


def _q_lookup(q, idx, R, n_act, nsb=NSB):
    """Q[idx, a] for every action: exact lane shuffles per (a, hi) bank."""
    lo = idx & (W - 1)
    hi = idx >> 7
    vals = []
    for a in range(n_act):
        v = None
        for b in range(nsb):
            bank = jnp.broadcast_to(
                jax.lax.slice(q, (a * nsb + b, 0), (a * nsb + b + 1, W)),
                (R, W),
            )
            g = jnp.take_along_axis(bank, lo, axis=1)
            v = g if v is None else jnp.where(hi == b, g, v)
        vals.append(v)
    return vals


def _first_argmax(vals, R):
    """First-max index over the action values (matches jnp.argmax ties)."""
    best_v = vals[0]
    best_a = jnp.zeros((R, W), jnp.int32)
    for a in range(1, len(vals)):
        better = vals[a] > best_v
        best_v = jnp.where(better, vals[a], best_v)
        best_a = jnp.where(better, a, best_a)
    return best_a, best_v


def _mxu_scatter(hi_scr, lo_scr, wtd_scr, R, average_duplicates, nb=NB):
    """Duplicate-accumulating scatter C[hi,lo] += w via per-row mask matmuls
    (TPUs have no scatter; the env axis is contracted on the MXU).

    The weighted matmul runs in bf16x2 SPLIT precision: ``X = x_hi + x_lo``
    with ``x_hi`` exactly bf16-representable, two default-precision MXU
    passes — relative error ~2⁻¹⁶ (vs exact), measured 39% faster
    end-to-end than the 3-pass ``Precision.HIGHEST`` mode (971M vs 699M
    train steps/s at B=64k).  The count matmul's 0/1 operands are exact in
    bf16 already."""

    def hist_chunk(c, acc):
        acc_s, acc_n = acc
        hi8 = hi_scr[pl.ds(c * 8, 8), :]
        lo8 = lo_scr[pl.ds(c * 8, 8), :]
        w8 = wtd_scr[pl.ds(c * 8, 8), :]
        for r in range(8):
            lo_r = jax.lax.slice(lo8, (r, 0), (r + 1, W))
            hi_r = jax.lax.slice(hi8, (r, 0), (r + 1, W))
            w_r = jax.lax.slice(w8, (r, 0), (r + 1, W))
            P = (
                jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
                == jnp.broadcast_to(lo_r, (W, W))
            ).astype(jnp.float32)
            M = (
                jax.lax.broadcasted_iota(jnp.int32, (nb, W), 0)
                == jnp.broadcast_to(hi_r, (nb, W))
            ).astype(jnp.float32)
            X = M * jnp.broadcast_to(w_r, (nb, W))
            x_hi = X.astype(jnp.bfloat16).astype(jnp.float32)
            x_lo = X - x_hi
            dn = (((1,), (1,)), ((), ()))
            acc_s = acc_s + jax.lax.dot_general(
                x_hi, P, dn, preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                x_lo, P, dn, preferred_element_type=jnp.float32,
            )
            if average_duplicates:  # duplicate counts: same masks
                acc_n = acc_n + jax.lax.dot_general(
                    M, P, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        return (acc_s, acc_n)

    zero_nb = jnp.zeros((nb, W), jnp.float32)
    dq, cnt = jax.lax.fori_loop(0, R // 8, hist_chunk, (zero_nb, zero_nb))
    if average_duplicates:
        dq = dq / jnp.maximum(cnt, jnp.float32(1.0))
    return dq


def make_fused_q_trainer(env, num_envs: int, num_steps: int,
                         gamma: float = 0.99,
                         average_duplicates: bool = False,
                         expected_sarsa: bool = False,
                         lam: float = 0.0,
                         trace_len: int = 8,
                         watkins_cut: bool = True,
                         interpret: bool = False,
                         rng_tape: bool = False):
    """Build ``run(seed, lr, epsilon, s, q) -> (s', q', reward_sums)``.

    ``expected_sarsa=True`` swaps the off-policy max-bootstrap for the
    ON-policy expectation under the epsilon-greedy behavior policy,
    ``next_v = (1-eps)·max_a Q + (eps/A)·Σ_a Q`` — Expected SARSA (van
    Seijen et al. 2009), lower-variance and safe under exploration.

    ``s``: int32 ``[num_envs//128, 128]`` encoded taxi states (from
    ``state.s.reshape(-1, 128)``); ``q``: f32 ``[32, 128]`` banked Q-table
    (see :func:`q_to_banks` / :func:`banks_to_q`); ``reward_sums``: f32
    per-env accumulated reward over the ``num_steps`` training steps.
    ``lr``/``epsilon`` are f32 ``[1]`` SMEM scalars — lr/epsilon SCHEDULES
    reuse the one executable (a fresh compile costs minutes on the tunnel).

    ``average_duplicates=False`` SUMS same-(s,a) updates within a batch
    (exactly the XLA agent's scatter-add semantics, exact vs the NumPy
    oracle) — but the effective per-state step is then ``lr × B/ns``, which
    DIVERGES for ``lr ≳ ns/B`` (measured: NaN at B=8192, lr=0.05).
    ``average_duplicates=True`` divides each entry's summed update by its
    duplicate count (a second mask matmul), making lr batch-size-invariant —
    use it to train at B=64k full speed.

    Works on the fully-observable Taxi (Q indexed by the state int) AND the
    Hansen partial-obs variant (``env.hansen``): the kernel computes the
    Hansen code arithmetically from the wall-code bank each step and indexes
    the Q-table by OBSERVATION — in-kernel POMDP tabular control (reference
    obs encode extended_taxi.py:366-372).  NOTE a memoryless tabular policy
    cannot solve Hansen taxi (perceptual aliasing; verified: the XLA agent
    plateaus at the same -0.05/step) — the POMDP path is for
    aliasing/abstraction research, not for reaching the MDP optimum (use
    ``agents.ppo_rnn`` for memoryful POMDP control).

    ``lam > 0`` switches to **Watkins Q(λ)** with the same ring-buffer
    truncated-trace scheme as the ROOMS variant
    (:func:`~gym_po_tpu.ops.fused_qlambda.make_fused_qlambda_trainer_rooms`):
    the last ``trace_len`` visited (obs, action) table addresses per env,
    each step's L-deep update materialized as one combined ``[L·R, 128]``
    MXU scatter with baked ``(γλ)^k`` weights.  ``watkins_cut=True`` clears
    the prior trace BEFORE the update at non-greedy-VALUED actions; the
    trace survives mid-episode task resets (a dropoff is a real MDP
    transition — the TD chain through the post-task-reset state is intact)
    and is cut at full episode resets.  ``lam=0`` reduces bit-exactly to
    the one-step path.  Incompatible with ``expected_sarsa`` (Watkins'
    trace soundness argument needs the off-policy max bootstrap).
    """
    interpret_mode = pltpu.InterpretParams() if interpret else False
    if not 0.0 <= float(lam) <= 1.0:
        raise ValueError(f"lam={lam} out of range [0, 1]")
    if not 1 <= int(trace_len) <= 64:
        raise ValueError(f"trace_len={trace_len} out of range [1, 64]")
    if float(lam) > 0.0 and expected_sarsa:
        raise ValueError("lam > 0 requires the max bootstrap "
                         "(expected_sarsa=False)")
    use_trace = float(lam) > 0.0
    L = int(trace_len)
    coefs = [np.float32((float(gamma) * float(lam)) ** k) for k in range(L)]
    L = max(k for k, c in enumerate(coefs) if float(c) != 0.0) + 1
    coefs = coefs[:L]
    use_trace = use_trace and L > 1
    t = env.tables
    nc = t.rows * t.cols
    if nc > W:
        raise ValueError(f"map has {nc} cells; fused Q trainer supports <= {W}")
    nlocs, rows, cols = t.nlocs, t.rows, t.cols
    pd = (nlocs + 1) * nlocs
    ns = nc * pd
    hansen = bool(getattr(env, "hansen", False))
    idx_n = int(env.observation_space.n)  # ns, or the Hansen obs count
    nsb, nb = bank_geometry(idx_n, 5)
    n_pass = env.num_passengers
    time_limit = env.time_limit
    r_goal, r_bad, r_any = env.reward_goal, env.reward_bad, env.reward_any
    all_valid = bool(env._all_cells_valid)

    if num_envs % W:
        raise ValueError("num_envs must be a multiple of 128")
    R = num_envs // W
    if R % 8:
        raise ValueError("num_envs must be a multiple of 1024")

    # cell_move: one combined [cell*4+a] row when it fits (classic), else
    # one row per action (extended, as fused_taxi)
    cm_host = np.asarray(env._cell_move).reshape(nc, 4)
    combined_cm = nc * 4 <= W
    if combined_cm:
        cm_bank = np.zeros((1, W), np.int32)
        cm_bank[0, : nc * 4] = cm_host.reshape(-1)
    else:
        cm_bank = np.zeros((4, W), np.int32)
        cm_bank[:, :nc] = cm_host.T
    cm = jnp.asarray(cm_bank)
    la_bank = np.full((1, W), nlocs, np.int32)
    la_bank[0, :nc] = np.asarray(env._loc_at)
    la = jnp.asarray(la_bank)
    hc_bank = np.zeros((1, W), np.int32)
    if hansen:
        hc_bank[0, :nc] = np.asarray(env._hansen_cell).reshape(-1)[:nc]
    hc = jnp.asarray(hc_bank)
    # reset-cell bank for maps with interior walls (extended: 55 valid)
    valid_cells = np.flatnonzero((t.tgrid != "|").reshape(-1))
    n_valid = int(valid_cells.size)
    vc_bank = np.zeros((1, W), np.int32)
    vc_bank[0, :n_valid] = valid_cells
    vc = jnp.asarray(vc_bank)

    gamma_f = float(gamma)

    # draw sites per step, in body-trace order: explore r24, random action,
    # task pn, task d0, full-reset cell (2 draws when all cells navigable,
    # else 1), reset pr, reset dr0
    n_sites = 6 + (2 if all_valid else 1)

    def kernel(seed_ref, lr_ref, eps_ref, s_ref, q_ref, cm_ref, la_ref,
               hc_ref, vc_ref, *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        if use_trace:
            (s_out, q_out, rew_ref,
             hh_scr, hl_scr, sc_hi, sc_lo, sc_w) = outs
        else:
            s_out, q_out, rew_ref, hi_scr, lo_scr, wtd_scr = outs
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        rng.seed(seed_ref[0])
        rbits, r24 = rng.rbits, rng.r24
        lr_v = lr_ref[0]
        # epsilon compares against raw 24-bit uniform draws
        eps24 = (eps_ref[0] * jnp.float32(1 << 24)).astype(jnp.int32)
        la_b = jnp.broadcast_to(la_ref[:], (R, W))
        hc_b = jnp.broadcast_to(hc_ref[:], (R, W))
        vc_b = jnp.broadcast_to(vc_ref[:], (R, W))

        def gather(idx, tab):
            return jnp.take_along_axis(tab, idx, axis=1)

        def qvals(q, s):
            return _q_lookup(q, s, R, 5, nsb)

        def argmax5(vals):
            return _first_argmax(vals, R)

        def obs_of(s):
            """Q index: the state itself, or its Hansen observation code."""
            if not hansen:
                return s
            rc = s // pd
            rem = s % pd
            return (
                jnp.take_along_axis(hc_b, rc, axis=1) * (nlocs + 1)
                + rem // nlocs
            ) * nlocs + rem % nlocs

        def body(step, carry):
            s, q, completed, elapsed, age, racc = carry
            rng.begin_step(step)
            qidx = obs_of(s)
            vals = qvals(q, qidx)
            greedy, best_v = argmax5(vals)
            explore = r24() < eps24
            a = jnp.where(explore, rbits(5), greedy)
            q_taken = vals[0]
            for i in range(1, 5):
                q_taken = jnp.where(a == i, vals[i], q_taken)
            # Watkins cut BEFORE the update (value-compare: argmax ties are
            # greedy) — see make_fused_qlambda_trainer_rooms for why cutting
            # after collapses learning
            if use_trace and watkins_cut:
                age = jnp.where(q_taken < best_v, 0, age)

            # --- taxi transition (reference extended_taxi.py:244-287) ---
            rc = s // pd
            rem = s % pd
            p = rem // nlocs
            d = rem % nlocs
            if combined_cm:
                moved = gather(
                    rc * 4 + jnp.minimum(a, 3),
                    jnp.broadcast_to(cm_ref[0:1, :], (R, W)),
                )
            else:  # per-action rows + selects (extended map)
                moved = gather(rc, jnp.broadcast_to(cm_ref[0:1, :], (R, W)))
                for i in (1, 2, 3):
                    moved = jnp.where(
                        a == i,
                        gather(rc, jnp.broadcast_to(cm_ref[i : i + 1, :],
                                                    (R, W))),
                        moved,
                    )
            is_pd = a == 4
            loc = gather(rc, la_b)
            goal = is_pd & (p == nlocs) & (loc == d)
            pickup = is_pd & (p < nlocs) & (loc == p)
            bad = is_pd & (~goal) & (~pickup)
            p2 = jnp.where(pickup, nlocs, p)
            rc2 = jnp.where(is_pd, rc, moved)
            completed = completed + goal.astype(jnp.int32)
            rew = jnp.where(
                goal, jnp.float32(r_goal),
                jnp.where(bad, jnp.float32(r_bad), jnp.float32(r_any)),
            )
            elapsed = elapsed + 1
            done = completed == n_pass
            trunc = elapsed > time_limit

            # --- task reset BEFORE the TD target: the episode continues
            # with a new passenger/destination, so that IS the next state
            # (matches the scan path's terminal_state, taxi.py step_vec) ---
            task = goal & ~(done | trunc)
            pn = rbits(nlocs)
            d0 = rbits(nlocs - 1)
            dn = d0 + (d0 >= pn)
            p3 = jnp.where(task, pn, p2)
            d3 = jnp.where(task, dn, d)
            s_mid = (rc2 * (nlocs + 1) + p3) * nlocs + d3

            # --- TD target from the PRE-(full-)reset terminal state ---
            vals2 = qvals(q, obs_of(s_mid))
            _, next_max = argmax5(vals2)
            if expected_sarsa:
                eps_f = eps_ref[0]
                mean2 = vals2[0]
                for i in range(1, 5):
                    mean2 = mean2 + vals2[i]
                mean2 = mean2 * jnp.float32(0.2)
                next_v = (jnp.float32(1.0) - eps_f) * next_max + eps_f * mean2
            else:
                next_v = next_max
            target = rew + jnp.float32(gamma_f) * next_v * jnp.where(
                done, jnp.float32(0.0), jnp.float32(1.0)
            )
            td = target - q_taken

            # --- MXU scatter: C[hi, lo] += lr*td over all envs ---
            # (staged through VMEM scratch: Mosaic supports dynamic sublane
            # slicing on refs, not on values)
            if use_trace:
                # ring-write the current pair; one combined L·R-row scatter
                # with baked (γλ)^k weights (see fused_qlambda)
                slot_w = jax.lax.rem(step, L)
                hh_scr[pl.ds(slot_w * R, R), :] = a * nsb + (qidx >> 7)
                hl_scr[pl.ds(slot_w * R, R), :] = qidx & (W - 1)
                age = jnp.minimum(age + 1, L)
                wd = lr_v * td
                for k in range(L):
                    slot_r = jax.lax.rem(step - k + L, L)
                    hi_k = hh_scr[pl.ds(slot_r * R, R), :]
                    lo_k = hl_scr[pl.ds(slot_r * R, R), :]
                    live = k < age
                    sc_hi[k * R : (k + 1) * R, :] = jnp.where(live, hi_k, -1)
                    sc_lo[k * R : (k + 1) * R, :] = lo_k
                    sc_w[k * R : (k + 1) * R, :] = jnp.where(
                        live, coefs[k] * wd, jnp.float32(0.0)
                    )
                q = q + _mxu_scatter(sc_hi, sc_lo, sc_w, L * R,
                                     average_duplicates, nb)
            else:
                hi_scr[:] = a * nsb + (qidx >> 7)
                lo_scr[:] = qidx & (W - 1)
                wtd_scr[:] = lr_v * td
                q = q + _mxu_scatter(hi_scr, lo_scr, wtd_scr, R,
                                     average_duplicates, nb)

            # --- full episode resets (as fused_taxi) ---
            reset = done | trunc
            if all_valid:
                rc_new = rbits(rows) * cols + rbits(cols)
            else:
                rc_new = gather(rbits(n_valid), vc_b)
            pr = rbits(nlocs)
            dr0 = rbits(nlocs - 1)
            dr = dr0 + (dr0 >= pr)
            rc3 = jnp.where(reset, rc_new, rc2)
            p4 = jnp.where(reset, pr, p3)
            d4 = jnp.where(reset, dr, d3)
            completed = jnp.where(reset, 0, completed)
            elapsed = jnp.where(reset, 0, elapsed)
            if use_trace:  # trace dies with the episode (not at task resets)
                age = jnp.where(reset, 0, age)
            s2 = (rc3 * (nlocs + 1) + p4) * nlocs + d4
            return (s2, q, completed, elapsed, age, racc + rew)

        zeros = jnp.zeros((R, W), jnp.int32)
        s, q, _, _, _, racc = jax.lax.fori_loop(
            0, num_steps, body,
            (s_ref[:], q_ref[:], zeros, zeros, zeros,
             jnp.zeros((R, W), jnp.float32)),
        )
        rng.finalize(n_sites)
        s_out[:] = s
        q_out[:] = q
        rew_ref[:] = racc

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tape_specs = [vspec] if rng_tape else []
    tape_rows = KernelRNG.tape_rows(n_sites, num_steps, R)

    @jax.jit
    def run(seed: jax.Array, lr: jax.Array, epsilon: jax.Array,
            s: jax.Array, q: jax.Array, *tape):
        if rng_tape and tuple(tape[0].shape) != (tape_rows, W):
            raise ValueError(
                f"rng tape must have shape {(tape_rows, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [vspec] * 6 + tape_specs,
            out_specs=(vspec, vspec, vspec),
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((nb, W), jnp.float32),
                jax.ShapeDtypeStruct((R, W), jnp.float32),
            ),
            scratch_shapes=(
                [
                    pltpu.VMEM((L * R, W), jnp.int32),   # ring: bank hi
                    pltpu.VMEM((L * R, W), jnp.int32),   # ring: lane lo
                    pltpu.VMEM((L * R, W), jnp.int32),   # scatter hi
                    pltpu.VMEM((L * R, W), jnp.int32),   # scatter lo
                    pltpu.VMEM((L * R, W), jnp.float32),  # scatter weights
                ]
                if use_trace
                else [
                    pltpu.VMEM((R, W), jnp.int32),
                    pltpu.VMEM((R, W), jnp.int32),
                    pltpu.VMEM((R, W), jnp.float32),
                ]
            ),
        )(seed, jnp.asarray(lr, jnp.float32).reshape(1),
          jnp.asarray(epsilon, jnp.float32).reshape(1), s, q, cm, la, hc, vc,
          *tape)

    run.tape_shape = (tape_rows, W)
    run.n_sites = n_sites
    run.trace_len = L if use_trace else 1
    return run


def make_fused_q_trainer_rooms(env, num_envs: int, num_steps: int,
                               gamma: float = 0.99,
                               average_duplicates: bool = False,
                               interpret: bool = False,
                               rng_tape: bool = False):
    """In-kernel tabular Q-learning for :class:`Rooms` (fixed goal).

    Same contract as :func:`make_fused_q_trainer` —
    ``run(seed, lr, epsilon, agent, q) -> (agent', q', reward_sums)`` with
    ``agent`` the flat-cell tile ``[B//128, 128]`` — generalized to ANY
    discrete observation model: the per-cell observation table is
    precomputed host-side by evaluating the env's own ``_obs_fn`` on every
    cell (mdp / hansen / room abstractions all work), and the kernel
    indexes the Q-table by observation.  Stochastic action failure is
    sampled from its generative process exactly as :mod:`.fused_rooms`;
    the Q update is indexed by the COMMANDED action (the agent's choice),
    matching the XLA agent.

    ``lr=0, epsilon=0`` turns the same executable into greedy POLICY
    EVALUATION of the supplied Q-table at full kernel speed.
    """
    from ..core import Discrete

    interpret_mode = pltpu.InterpretParams() if interpret else False
    if not isinstance(env.observation_space, Discrete):
        raise ValueError("rooms Q trainer needs a Discrete observation space")
    n_obs = int(env.observation_space.n)
    if n_obs > 512:
        raise ValueError(f"n_obs={n_obs} > 512: Q banks would exceed 32 rows")
    if env.fixed_goal_yx is None:
        raise ValueError("rooms Q trainer requires a fixed goal")
    grid_np = env.grid_np
    H, GW = grid_np.shape
    ncells = H * GW
    A = int(env.num_actions)
    if A * NSB > NB:
        raise ValueError(f"{A} actions exceed the {NB}-row Q bank")
    disp = np.asarray(env._actions)
    disp_flat = (disp[:, 0] * GW + disp[:, 1]).astype(np.int32)
    p_fail = 1.0 - float(env._cum[0][0])
    step_r, wall_r, goal_r = env.step_reward, env.wall_reward, env.goal_reward
    time_limit = int(env.time_limit)
    goal_flat = int(env.fixed_goal_yx[0] * GW + env.fixed_goal_yx[1])
    fixed_agent = env.fixed_agent_yx
    fixed_agent_flat = (
        int(fixed_agent[0] * GW + fixed_agent[1])
        if fixed_agent is not None else -1
    )

    def _rows_bank(values: np.ndarray, fill: int) -> np.ndarray:
        n_rows = -(-values.size // W)
        bank = np.full((n_rows, W), fill, np.int32)
        bank.reshape(-1)[: values.size] = values
        return bank

    # per-cell observation table via the env's own obs fn (host, once)
    cells_yx = np.stack(np.divmod(np.arange(ncells), GW), -1).astype(np.int32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        obs_all = np.asarray(
            jax.vmap(
                lambda yx: env._obs_fn(yx, jnp.asarray(env.fixed_goal_yx))
            )(jnp.asarray(cells_yx)),
            np.int64,
        )
    obs_tab = np.clip(obs_all, 0, n_obs - 1).astype(np.int32)
    obs_tab[grid_np.reshape(-1) == -1] = 0  # walls: never queried

    wall_bank = _rows_bank((grid_np.reshape(-1) == -1).astype(np.int32), 1)
    valid_cells = np.flatnonzero(grid_np.reshape(-1) >= 0).astype(np.int32)
    n_valid = valid_cells.size
    valid_bank = _rows_bank(valid_cells, 0)
    obs_bank = _rows_bank(obs_tab, 0)
    disp_bank = _rows_bank(disp_flat, 0)
    n_wall_rows, n_valid_rows = wall_bank.shape[0], valid_bank.shape[0]
    n_obs_rows = obs_bank.shape[0]
    wall_b = jnp.asarray(wall_bank)
    valid_b = jnp.asarray(valid_bank)
    obs_b = jnp.asarray(obs_bank)
    disp_b = jnp.asarray(disp_bank)

    if num_envs % W:
        raise ValueError("num_envs must be a multiple of 128")
    R = num_envs // W
    if R % 8:
        raise ValueError("num_envs must be a multiple of 1024")
    gamma_f = float(gamma)

    # draw sites per step, in body-trace order: explore r24, random action,
    # failure r24, alt action, agent respawn (fixed spawn: no draw)
    n_sites = 4 + (0 if fixed_agent_flat >= 0 else 1)

    def kernel(seed_ref, lr_ref, eps_ref, a_ref, q_ref,
               wall_r_, valid_r_, obs_r_, disp_r_, *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        a_out, q_out, rew_ref, hi_scr, lo_scr, wtd_scr = outs
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        rng.seed(seed_ref[0])
        rbits, r24 = rng.rbits, rng.r24
        lr_v = lr_ref[0]
        eps24 = (eps_ref[0] * jnp.float32(1 << 24)).astype(jnp.int32)

        def shuffle(lane_idx, row):
            return jnp.take_along_axis(
                jnp.broadcast_to(row, (R, W)), lane_idx, axis=1
            )

        def bank_gather(idx, bank_ref, n_rows):
            lane = idx % W
            row = idx // W
            out = shuffle(lane, bank_ref[0:1, :])
            for r in range(1, n_rows):
                out = jnp.where(
                    row == r, shuffle(lane, bank_ref[r : r + 1, :]), out
                )
            return out

        def sample_agent():
            if fixed_agent_flat >= 0:
                return jnp.full((R, W), fixed_agent_flat, jnp.int32)
            return bank_gather(rbits(n_valid), valid_r_, n_valid_rows)

        def body(step, carry):
            agent, q, elapsed, racc = carry
            rng.begin_step(step)
            qidx = bank_gather(agent, obs_r_, n_obs_rows)
            vals = _q_lookup(q, qidx, R, A)
            greedy, _ = _first_argmax(vals, R)
            explore = r24() < eps24
            a_cmd = jnp.where(explore, rbits(A), greedy)
            q_taken = vals[0]
            for i in range(1, A):
                q_taken = jnp.where(a_cmd == i, vals[i], q_taken)

            # stochastic failure from its generative process
            fail = r24() < jnp.int32(int(p_fail * (1 << 24)))
            alt = rbits(A - 1)
            executed = jnp.where(fail, alt + (alt >= a_cmd), a_cmd)
            d = shuffle(executed, disp_r_[0:1, :])
            proposed = jnp.clip(agent + d, 0, ncells - 1)
            oob = bank_gather(proposed, wall_r_, n_wall_rows) == 1
            agent2 = jnp.where(oob, agent, proposed)
            done = agent2 == goal_flat
            rew = jnp.where(
                done,
                jnp.float32(goal_r),
                jnp.where(oob, jnp.float32(wall_r), jnp.float32(step_r)),
            )
            elapsed = elapsed + 1
            trunc = elapsed > time_limit

            # TD target from the pre-reset next state
            qidx2 = bank_gather(agent2, obs_r_, n_obs_rows)
            _, next_v = _first_argmax(_q_lookup(q, qidx2, R, A), R)
            target = rew + jnp.float32(gamma_f) * next_v * jnp.where(
                done, jnp.float32(0.0), jnp.float32(1.0)
            )
            td = target - q_taken
            hi_scr[:] = a_cmd * NSB + (qidx >> 7)
            lo_scr[:] = qidx & (W - 1)
            wtd_scr[:] = lr_v * td
            q = q + _mxu_scatter(hi_scr, lo_scr, wtd_scr, R,
                                 average_duplicates)

            reset = done | trunc
            agent3 = jnp.where(reset, sample_agent(), agent2)
            elapsed = jnp.where(reset, 0, elapsed)
            return (agent3, q, elapsed, racc + rew)

        zeros = jnp.zeros((R, W), jnp.int32)
        agent, q, _, racc = jax.lax.fori_loop(
            0, num_steps, body,
            (a_ref[:], q_ref[:], zeros, jnp.zeros((R, W), jnp.float32)),
        )
        rng.finalize(n_sites)
        a_out[:] = agent
        q_out[:] = q
        rew_ref[:] = racc

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tape_specs = [vspec] if rng_tape else []
    tape_rows = KernelRNG.tape_rows(n_sites, num_steps, R)

    @jax.jit
    def run(seed: jax.Array, lr: jax.Array, epsilon: jax.Array,
            agent: jax.Array, q: jax.Array, *tape):
        if rng_tape and tuple(tape[0].shape) != (tape_rows, W):
            raise ValueError(
                f"rng tape must have shape {(tape_rows, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [vspec] * 6 + tape_specs,
            out_specs=(vspec, vspec, vspec),
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((NB, W), jnp.float32),
                jax.ShapeDtypeStruct((R, W), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, W), jnp.int32),
                pltpu.VMEM((R, W), jnp.int32),
                pltpu.VMEM((R, W), jnp.float32),
            ],
        )(seed, jnp.asarray(lr, jnp.float32).reshape(1),
          jnp.asarray(epsilon, jnp.float32).reshape(1), agent, q,
          wall_b, valid_b, obs_b, disp_b, *tape)

    run.tape_shape = (tape_rows, W)
    run.n_sites = n_sites
    return run


def make_fused_q_trainer_msrooms(env, num_envs: int, num_steps: int,
                                 gamma: float = 0.99,
                                 average_duplicates: bool = False,
                                 interpret: bool = False,
                                 rng_tape: bool = False):
    """In-kernel tabular Q-learning for :class:`MultistoryFourRooms`.

    Same contract as :func:`make_fused_q_trainer_rooms` with the flat zyx
    cell index as state (``z*H*W + y*W + x``) and in-kernel stair transit
    (stair_up teleports +floor to the SW square, stair_down -floor to NE —
    reference msrooms.py:419-428).  Requires a fixed goal; the observation
    table is precomputed through the env's own obs fn.
    """
    from ..core import Discrete
    from ..envs.msrooms import (
        DOWNSTAIRS_SW,
        STAIR_DOWN,
        STAIR_UP,
        UPSTAIRS_NE,
        WALL,
    )

    interpret_mode = pltpu.InterpretParams() if interpret else False
    if not isinstance(env.observation_space, Discrete):
        raise ValueError("msrooms Q trainer needs a Discrete observation space")
    n_obs = int(env.observation_space.n)
    if n_obs > 512:
        raise ValueError(f"n_obs={n_obs} > 512: Q banks would exceed 32 rows")
    if env.fixed_goal_zyx is None:
        raise ValueError("msrooms Q trainer requires a fixed goal")
    grid_np = env.grid_np
    Z, H, GW = grid_np.shape
    HW = H * GW
    ncells = Z * HW
    A = int(env.num_actions)
    if A * NSB > NB:
        raise ValueError(f"{A} actions exceed the {NB}-row Q bank")
    disp = np.asarray(env._actions)
    disp_flat = (disp[:, 1] * GW + disp[:, 2]).astype(np.int32)
    p_fail = 1.0 - float(env._cum[0][0])
    step_r, wall_r, goal_r = env.step_reward, env.wall_reward, env.goal_reward
    time_limit = int(env.time_limit)
    gz, gy, gx = (int(v) for v in env.fixed_goal_zyx)
    goal_flat = gz * HW + gy * GW + gx
    sw_flat = DOWNSTAIRS_SW[0] * GW + DOWNSTAIRS_SW[1]
    ne_flat = UPSTAIRS_NE[0] * GW + UPSTAIRS_NE[1]

    def _rows_bank(values: np.ndarray, fill: int) -> np.ndarray:
        n_rows = -(-values.size // W)
        bank = np.full((n_rows, W), fill, np.int32)
        bank.reshape(-1)[: values.size] = values
        return bank

    cells_zyx = np.stack(
        np.unravel_index(np.arange(ncells), grid_np.shape), -1
    ).astype(np.int32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        obs_all = np.asarray(
            jax.vmap(
                lambda zyx: env._obs_fn(zyx, jnp.asarray(env.fixed_goal_zyx))
            )(jnp.asarray(cells_zyx)),
            np.int64,
        )
    obs_tab = np.clip(obs_all, 0, n_obs - 1).astype(np.int32)
    obs_tab[grid_np.reshape(-1) == WALL] = 0

    cell_bank = _rows_bank(grid_np.reshape(-1).astype(np.int32), WALL)
    agent_cells = np.asarray(env.valid_agent_states, np.int32)
    n_agent = agent_cells.size
    agent_bank = _rows_bank(agent_cells, 0)
    obs_bank = _rows_bank(obs_tab, 0)
    disp_bank = _rows_bank(disp_flat, 0)
    n_cell_rows, n_agent_rows = cell_bank.shape[0], agent_bank.shape[0]
    n_obs_rows = obs_bank.shape[0]
    cell_b = jnp.asarray(cell_bank)
    agent_b = jnp.asarray(agent_bank)
    obs_b = jnp.asarray(obs_bank)
    disp_b = jnp.asarray(disp_bank)

    if num_envs % W:
        raise ValueError("num_envs must be a multiple of 128")
    R = num_envs // W
    if R % 8:
        raise ValueError("num_envs must be a multiple of 1024")
    gamma_f = float(gamma)

    # draw sites per step, in body-trace order: explore r24, random action,
    # failure r24, alt action, agent respawn
    n_sites = 5

    def kernel(seed_ref, lr_ref, eps_ref, a_ref, q_ref,
               cell_r, agent_r, obs_r, disp_r, *outs):
        outs = list(outs)
        tape_ref = outs.pop(0) if rng_tape else None
        a_out, q_out, rew_ref, hi_scr, lo_scr, wtd_scr = outs
        rng = KernelRNG(R, num_steps, tape_ref=tape_ref)
        rng.seed(seed_ref[0])
        rbits, r24 = rng.rbits, rng.r24
        lr_v = lr_ref[0]
        eps24 = (eps_ref[0] * jnp.float32(1 << 24)).astype(jnp.int32)

        def shuffle(lane_idx, row):
            return jnp.take_along_axis(
                jnp.broadcast_to(row, (R, W)), lane_idx, axis=1
            )

        def bank_gather(idx, bank_ref, n_rows):
            lane = idx % W
            row = idx // W
            out = shuffle(lane, bank_ref[0:1, :])
            for r in range(1, n_rows):
                out = jnp.where(
                    row == r, shuffle(lane, bank_ref[r : r + 1, :]), out
                )
            return out

        def body(step, carry):
            agent, q, elapsed, racc = carry
            rng.begin_step(step)
            qidx = bank_gather(agent, obs_r, n_obs_rows)
            vals = _q_lookup(q, qidx, R, A)
            greedy, _ = _first_argmax(vals, R)
            explore = r24() < eps24
            a_cmd = jnp.where(explore, rbits(A), greedy)
            q_taken = vals[0]
            for i in range(1, A):
                q_taken = jnp.where(a_cmd == i, vals[i], q_taken)

            fail = r24() < jnp.int32(int(p_fail * (1 << 24)))
            alt = rbits(A - 1)
            executed = jnp.where(fail, alt + (alt >= a_cmd), a_cmd)
            d = shuffle(executed, disp_r[0:1, :])
            proposed = jnp.clip(agent + d, 0, ncells - 1)
            oob = bank_gather(proposed, cell_r, n_cell_rows) == WALL
            agent2 = jnp.where(oob, agent, proposed)
            # stair transit (reference msrooms.py:419-428)
            acell = bank_gather(agent2, cell_r, n_cell_rows)
            z = agent2 // HW
            go_up = (acell == STAIR_UP) & ~oob
            go_down = (acell == STAIR_DOWN) & ~oob
            agent2 = jnp.where(go_up, (z + 1) * HW + sw_flat, agent2)
            agent2 = jnp.where(go_down, (z - 1) * HW + ne_flat, agent2)
            done = agent2 == goal_flat
            rew = jnp.where(
                done,
                jnp.float32(goal_r),
                jnp.where(oob, jnp.float32(wall_r), jnp.float32(step_r)),
            )
            elapsed = elapsed + 1
            trunc = elapsed > time_limit

            qidx2 = bank_gather(agent2, obs_r, n_obs_rows)
            _, next_v = _first_argmax(_q_lookup(q, qidx2, R, A), R)
            target = rew + jnp.float32(gamma_f) * next_v * jnp.where(
                done, jnp.float32(0.0), jnp.float32(1.0)
            )
            td = target - q_taken
            hi_scr[:] = a_cmd * NSB + (qidx >> 7)
            lo_scr[:] = qidx & (W - 1)
            wtd_scr[:] = lr_v * td
            q = q + _mxu_scatter(hi_scr, lo_scr, wtd_scr, R,
                                 average_duplicates)

            reset = done | trunc
            spawn = bank_gather(rbits(n_agent), agent_r, n_agent_rows)
            agent3 = jnp.where(reset, spawn, agent2)
            elapsed = jnp.where(reset, 0, elapsed)
            return (agent3, q, elapsed, racc + rew)

        zeros = jnp.zeros((R, W), jnp.int32)
        agent, q, _, racc = jax.lax.fori_loop(
            0, num_steps, body,
            (a_ref[:], q_ref[:], zeros, jnp.zeros((R, W), jnp.float32)),
        )
        rng.finalize(n_sites)
        a_out[:] = agent
        q_out[:] = q
        rew_ref[:] = racc

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tape_specs = [vspec] if rng_tape else []
    tape_rows = KernelRNG.tape_rows(n_sites, num_steps, R)

    @jax.jit
    def run(seed: jax.Array, lr: jax.Array, epsilon: jax.Array,
            agent: jax.Array, q: jax.Array, *tape):
        if rng_tape and tuple(tape[0].shape) != (tape_rows, W):
            raise ValueError(
                f"rng tape must have shape {(tape_rows, W)}, got "
                f"{tuple(tape[0].shape)}"
            )
        return pl.pallas_call(
            kernel,
            interpret=interpret_mode,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [vspec] * 6 + tape_specs,
            out_specs=(vspec, vspec, vspec),
            out_shape=(
                jax.ShapeDtypeStruct((R, W), jnp.int32),
                jax.ShapeDtypeStruct((NB, W), jnp.float32),
                jax.ShapeDtypeStruct((R, W), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, W), jnp.int32),
                pltpu.VMEM((R, W), jnp.int32),
                pltpu.VMEM((R, W), jnp.float32),
            ],
        )(seed, jnp.asarray(lr, jnp.float32).reshape(1),
          jnp.asarray(epsilon, jnp.float32).reshape(1), agent, q,
          cell_b, agent_b, obs_b, disp_b, *tape)

    run.tape_shape = (tape_rows, W)
    run.n_sites = n_sites
    return run


def q_to_banks(q: np.ndarray, nsb: int = NSB) -> np.ndarray:
    """[ns, na] table -> [nb, 128] banked VMEM layout
    (bank ``a*nsb + s>>7``, lane ``s&127``)."""
    ns, na = q.shape
    nb = max(NB, -(-(na * nsb) // 8) * 8)
    out = np.zeros((nb, W), np.float32)
    for a in range(na):
        for s in range(ns):
            e = a * nsb * W + s
            out[e >> 7, e & (W - 1)] = q[s, a]
    return out


def banks_to_q(banks: np.ndarray, ns: int, na: int = 5,
               nsb: int = NSB) -> np.ndarray:
    """Inverse of :func:`q_to_banks`."""
    q = np.zeros((ns, na), np.float32)
    for a in range(na):
        for s in range(ns):
            e = a * nsb * W + s
            q[s, a] = banks[e >> 7, e & (W - 1)]
    return q
