"""Weak-scaling sweep: aggregate env-steps/s vs device count.

Env stepping has no cross-device communication, so aggregate throughput
should scale linearly in devices (each shard runs the same single-chip
program).  On a pod slice this measures the real ICI-free scaling curve; on
the CPU backend (XLA_FLAGS=--xla_force_host_platform_device_count=8) it
validates the code path and the shard-invariance of the launch.

Usage: python benchmarks/scaling.py [--env HansenTaxi-v4] [--local-envs 65536]
"""

import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")
import gym_po_tpu as gpt  # noqa: E402
from gym_po_tpu.parallel import make_mesh, sharded_rollout  # noqa: E402


def bench(env, devices, local_envs, steps, iters=3, windows=4):
    mesh = make_mesh(devices=devices)
    n = len(devices)
    key = jax.random.PRNGKey(0)

    def run(k):
        traj, (obs, st) = sharded_rollout(
            env, mesh, k, None, num_envs=local_envs * n, num_steps=steps
        )
        return traj.reward.sum()

    s = run(key)
    _ = float(s)  # scalar-fetch sync
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            s = run(jax.random.fold_in(key, w * iters + i))
        _ = float(s)
        rates.append(local_envs * n * steps * iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="HansenTaxi-v4")
    p.add_argument("--local-envs", type=int, default=65536)
    p.add_argument("--steps", type=int, default=256)
    args = p.parse_args()
    env = gpt.make(args.env)
    devs = jax.devices()
    n = 1
    base = None
    while n <= len(devs):
        sps = bench(env, devs[:n], args.local_envs, args.steps)
        if base is None:
            base = sps
        print(
            json.dumps(
                {
                    "env": args.env,
                    "devices": n,
                    "steps_per_s": round(sps),
                    "efficiency": round(sps / (base * n), 3),
                }
            ),
            flush=True,
        )
        n *= 2


if __name__ == "__main__":
    main()
