"""Component-level timing probe for the ant engine forward pass.

Answers "where do the 24.5 ms/forward at B=4096 go": smooth dynamics,
constraint-row assembly, or the Newton solve.  Each component is wrapped in
a lax.scan with carry feedback (real sequential dependency, like the
integrator) and timed with value-fetch sync (CLAUDE.md timing rules).

    python benchmarks/physics_probe.py [--batch 4096] [--inner 60]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gym_po_tpu.physics import make_ant_model, TAG_WALLS
from gym_po_tpu.physics.contact import (
    constraint_rows, solve_constraints_newton,
)
from gym_po_tpu.physics.dynamics import smooth_forward_s
from gym_po_tpu.physics.engine import forward
from gym_po_tpu.utils import pin_platform_from_env

pin_platform_from_env()

STAND = np.array(
    [0.0, 0.0, 0.55, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0, -1.0,
     0.0, 1.0], np.float32,
)


def timeit(name, fn, *args, windows=5):
    t0 = time.perf_counter()
    float(fn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{name:28s} compile={compile_s:7.1f}s  window={med * 1e3:9.2f}ms",
          flush=True)
    return med


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--inner", type=int, default=60,
                    help="sequential evals per window (~1 env step)")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    b, inner = args.batch, args.inner

    model = make_ant_model(TAG_WALLS)
    print(f"device={jax.devices()[0].platform} B={b} inner={inner}")

    key = jax.random.PRNGKey(0)
    kq, kv, ka = jax.random.split(key, 3)
    qpos = jnp.asarray(STAND)[None] + 0.01 * jax.random.normal(
        kq, (b, 15), jnp.float32)
    qvel = 0.1 * jax.random.normal(kv, (b, 14), jnp.float32)
    ctrl = jax.random.uniform(ka, (b, 8), jnp.float32, -1.0, 1.0)

    def smooth_one(qp, qv, c):
        _, _, qacc, _ = smooth_forward_s(model, qp, qv, c)
        return jnp.stack(qacc)

    @jax.jit
    def run_smooth(qpos, qvel, ctrl):
        def body(v, _):
            a = jax.vmap(smooth_one)(qpos, v, ctrl)
            return v + 1e-4 * a, ()
        v, _ = jax.lax.scan(body, qvel, None, length=inner)
        return jnp.sum(v)

    def rows_one(qp, qv, c):
        skin, _, _, _ = smooth_forward_s(model, qp, qv, c)
        r = constraint_rows(model, skin, qp, qv)
        return r.jac_t.sum() + r.aref.sum() + r.r.sum() + r.active.sum()

    @jax.jit
    def run_rows(qpos, qvel, ctrl):
        def body(v, _):
            s = jax.vmap(rows_one)(qpos, v, ctrl)
            return v + 1e-6 * s[:, None], ()
        v, _ = jax.lax.scan(body, qvel, None, length=inner)
        return jnp.sum(v)

    def newton_one(qp, qv, c, rows_cache):
        skin, M_s, qacc_s, _ = smooth_forward_s(model, qp, qv, c)
        M = jnp.stack([jnp.stack([jnp.asarray(x, jnp.float32) for x in row])
                       for row in M_s])
        qs = jnp.stack([jnp.asarray(x, jnp.float32) for x in qacc_s])
        qacc, _ = solve_constraints_newton(
            model, M, qs, rows_cache, iters=args.iters)
        return qacc

    def rows_only(qp, qv, c):
        skin, _, _, _ = smooth_forward_s(model, qp, qv, c)
        return constraint_rows(model, skin, qp, qv)

    rows_cache = jax.jit(jax.vmap(rows_only))(qpos, qvel, ctrl)
    rows_cache = jax.tree_util.tree_map(lambda x: x.block_until_ready(),
                                        rows_cache)

    @jax.jit
    def run_newton(qpos, qvel, ctrl, rows_cache):
        def body(v, _):
            a = jax.vmap(newton_one, in_axes=(0, 0, 0, 0))(
                qpos, v, ctrl, rows_cache)
            return v + 1e-4 * a, ()
        v, _ = jax.lax.scan(body, qvel, None, length=inner)
        return jnp.sum(v)

    @jax.jit
    def run_forward(qpos, qvel, ctrl):
        def body(v, _):
            a, _ = jax.vmap(
                lambda qp, qv, c: forward(model, qp, qv, c,
                                          iters=args.iters)
            )(qpos, v, ctrl)
            return v + 1e-4 * a, ()
        v, _ = jax.lax.scan(body, qvel, None, length=inner)
        return jnp.sum(v)

    t_s = timeit("smooth_forward only", run_smooth, qpos, qvel, ctrl)
    t_r = timeit("smooth + rows", run_rows, qpos, qvel, ctrl)
    t_n = timeit("smooth + newton (fixed rows)", run_newton,
                 qpos, qvel, ctrl, rows_cache)
    t_f = timeit("full forward", run_forward, qpos, qvel, ctrl)
    print(f"\nper-forward @B={b}: smooth={t_s / inner * 1e3:.2f}ms  "
          f"rows={(t_r - t_s) / inner * 1e3:.2f}ms  "
          f"newton={(t_n - t_s) / inner * 1e3:.2f}ms  "
          f"full={t_f / inner * 1e3:.2f}ms")


if __name__ == "__main__":
    main()
