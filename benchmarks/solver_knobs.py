"""Probe the ant engine's solver cost knobs on hardware.

Times physics.engine.step at B=4096 for a grid of (iters, ls_iters)
Newton configurations (and both integrators), in ONE process so the
tunnel/session cost is paid once.  The iters=2 point separates
compute-bound from dispatch-overhead-bound: if wall time tracks the
Newton op count, the engine is VPU-issue-bound and trimming iterations
is the lever; if it doesn't, the overhead is elsewhere.

    python benchmarks/solver_knobs.py [--batch 4096] [--steps 8]
        [--integrator euler] [--configs 8:10,8:5,6:6,4:4,2:10]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")  # repo root
from gym_po_tpu.physics import make_ant_model, TAG_WALLS
from gym_po_tpu.physics.engine import PhysicsState, step
from gym_po_tpu.utils import enable_compilation_cache, pin_platform_from_env

pin_platform_from_env()
enable_compilation_cache()

STAND = np.array(
    [0.0, 0.0, 0.55, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0, -1.0,
     0.0, 1.0], np.float32,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--integrator", default="euler")
    ap.add_argument("--frame-skip", type=int, default=15)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--configs", default="8:10,8:5,6:6,4:4,2:10")
    args = ap.parse_args()

    model = make_ant_model(TAG_WALLS)
    b = args.batch
    print(f"device={jax.devices()[0].platform} integrator={args.integrator} "
          f"B={b} frame_skip={args.frame_skip}")

    key = jax.random.PRNGKey(0)
    kq, kv, ka = jax.random.split(key, 3)
    qpos = jnp.asarray(STAND)[None] + 0.01 * jax.random.normal(
        kq, (b, 15), jnp.float32)
    qvel = 0.1 * jax.random.normal(kv, (b, 14), jnp.float32)
    warm = jnp.zeros((b, 14), jnp.float32)
    ctrl = jax.random.uniform(ka, (b, 8), jnp.float32, -1.0, 1.0)

    for cfg in args.configs.split(","):
        parts = [int(x) for x in cfg.split(":")]
        iters, ls = parts[0], parts[1]

        one = jax.vmap(lambda q, v, w, c: step(
            model, PhysicsState(q, v, w), c, frame_skip=args.frame_skip,
            iters=iters, integrator=args.integrator, ls_iters=ls))

        @jax.jit
        def run(qpos, qvel, warm, ctrl):
            def body(carry, _):
                q, v, w = carry
                s = one(q, v, w, ctrl)
                return (s.qpos, s.qvel, s.warm), ()

            (q, v, w), _ = jax.lax.scan(
                body, (qpos, qvel, warm), None, length=args.steps)
            return jnp.sum(q) + jnp.sum(v)

        t0 = time.perf_counter()
        float(run(qpos, qvel, warm, ctrl))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            float(run(qpos, qvel, warm, ctrl))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(f"iters={iters:2d} ls_iters={ls:2d}"
              f"  compile={compile_s:7.2f}s"
              f"  median={med * 1e3:8.2f}ms"
              f"  env-steps/s={b * args.steps / med:12,.0f}", flush=True)


if __name__ == "__main__":
    main()
