"""MFU / roofline accounting for the hot paths (VERDICT r4 #6).

Counts the FLOPs each program ACTUALLY executes — via the trip-count-aware
jaxpr walker in ``gym_po_tpu.utils.flops`` (XLA's own cost_analysis counts
loop bodies once and under-counts the engine ~200x) — then measures
steps/s on the attached device and reports achieved FLOP/s against the
chip's ceilings, naming the binding resource.

v5e (v5 lite) per-chip ceilings used (stated so the numbers are
reproducible; MXU/HBM are published, VPU/VMEM are architectural estimates):

* MXU: 197 TFLOP/s bf16 (f32 ~1/4 of that) — irrelevant here: the ant
  engine's scalar pipeline issues NO matmuls by design.
* VPU: 8×128 lanes × 4 ALUs × ~1.5 GHz ≈ 6.1 T f32 op/s (12.3 T with
  every op an FMA — our op mix is not FMA-dominated, so 6.1 T is the
  honest ceiling).
* VMEM: ~16 MB/core (pallas guide), read+write BW ~O(20) TB/s.
* HBM: 819 GB/s.

    python benchmarks/roofline.py [--batch 4096] [--steps 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gym_po_tpu.physics import TAG_WALLS, make_ant_model  # noqa: E402
from gym_po_tpu.physics.engine import PhysicsState, step  # noqa: E402
from gym_po_tpu.utils import enable_compilation_cache  # noqa: E402
from gym_po_tpu.utils.flops import flops_of  # noqa: E402
from gym_po_tpu.utils.platform import pin_platform_from_env  # noqa: E402

pin_platform_from_env()
enable_compilation_cache()

VPU_PEAK = 6.1e12  # f32 op/s, no-FMA (see module docstring)
STAND = np.array(
    [0.0, 0.0, 0.55, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0, -1.0,
     0.0, 1.0], np.float32,
)


def measure_engine(batch, steps, integrator, iters, windows=5):
    model = make_ant_model(TAG_WALLS)
    kq, kv, ka = jax.random.split(jax.random.PRNGKey(0), 3)
    qpos = jnp.asarray(STAND)[None] + 0.01 * jax.random.normal(
        kq, (batch, 15), jnp.float32)
    qvel = 0.1 * jax.random.normal(kv, (batch, 14), jnp.float32)
    warm = jnp.zeros((batch, 14), jnp.float32)
    ctrl = jax.random.uniform(ka, (batch, 8), jnp.float32, -1.0, 1.0)

    one = jax.vmap(lambda q, v, w, c: step(
        model, PhysicsState(q, v, w), c, frame_skip=15, iters=iters,
        integrator=integrator))

    @jax.jit
    def run(qpos, qvel, warm, ctrl):
        def body(carry, _):
            s = one(*carry, ctrl)
            return (s.qpos, s.qvel, s.warm), ()
        (q, v, _), _ = jax.lax.scan(body, (qpos, qvel, warm), None,
                                    length=steps)
        return jnp.sum(q) + jnp.sum(v)

    _ = float(run(qpos, qvel, warm, ctrl))      # compile + warm
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        _ = float(run(qpos, qvel, warm, ctrl))  # scalar fetch = honest sync
        times.append(time.perf_counter() - t0)
    return batch * steps / float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--skip-measure", action="store_true",
                    help="FLOP counts only (no device timing)")
    args = ap.parse_args()

    model = make_ant_model(TAG_WALLS)
    q = jnp.asarray(STAND)
    v = jnp.zeros(14)
    w = jnp.zeros(14)
    c = jnp.zeros(8)

    for integ, iters in (("rk4", 8), ("euler", 8), ("euler", 1)):
        fl = flops_of(
            lambda q, v, w, c: step(model, PhysicsState(q, v, w), c,
                                    frame_skip=15, iters=iters,
                                    integrator=integ), q, v, w, c)
        rec = {
            "program": f"ant engine {integ} fs=15 iters={iters} "
                       f"(scalar pipeline)",
            "flops_per_env_step": round(fl),
        }
        if not args.skip_measure:
            sps = measure_engine(args.batch, args.steps, integ, iters)
            rec.update({
                "batch": args.batch,
                "env_steps_per_s": round(sps),
                "achieved_tflops": round(fl * sps / 1e12, 3),
                "vpu_mfu_pct": round(100 * fl * sps / VPU_PEAK, 1),
            })
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
