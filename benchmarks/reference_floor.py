"""Measure the reference's NumPy steps/s on CPU — the comparison floor.

The reference publishes no numbers (BASELINE.md), so this establishes them:
per config, steps the reference vec env with random actions and reports
env-steps/s as one JSON line.

Usage: python benchmarks/reference_floor.py [--batches 1 4096 16384]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
from _reference import load_reference_module  # noqa: E402


def bench_taxi(batch, steps, hansen=False):
    ref = load_reference_module("gym_po.envs.extended_taxi")
    env = ref.TaxiVecEnv(batch, hansen_obs=hansen)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 5, (steps, batch))
    t0 = time.perf_counter()
    for t in range(steps):
        env.step(actions[t])
    return batch * steps / (time.perf_counter() - t0)


def bench_rooms(batch, steps):
    ref = load_reference_module("gym_po.envs.rooms.rooms")
    env = ref.RoomsEnv(batch, layout="4", obs_type="hansen", goal_xy=None)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 8, (steps, batch))
    t0 = time.perf_counter()
    for t in range(steps):
        env.step(actions[t])
    return batch * steps / (time.perf_counter() - t0)


def bench_crooms(batch, steps):
    ref = load_reference_module("gym_po.envs.rooms.crooms")
    env = ref.CRoomsEnv(batch, layout="4", use_velocity=True, goal_xy=None)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, (steps, batch, 2))
    t0 = time.perf_counter()
    for t in range(steps):
        env.step(actions[t])
    return batch * steps / (time.perf_counter() - t0)


def bench_car_flag(batch, steps):
    ref = load_reference_module("gym_po.envs.car_flag")
    env = ref.CarVecEnv(batch)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, (steps, batch, 1)).astype(np.float32)
    t0 = time.perf_counter()
    for t in range(steps):
        env.step(actions[t])
    return batch * steps / (time.perf_counter() - t0)


def bench_msrooms(batch, steps):
    # the mechanically-repaired oracle (tests/_reference.py: the shipped
    # module NameErrors on its mangled signatures, SURVEY.md O6)
    ref = load_reference_module("gym_po.envs.rooms.msrooms")
    env = ref.MultistoryFourRoomsEnv(batch, grid_z=3, obs_type="hansen")
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.integers(0, 4, (steps, batch))
    t0 = time.perf_counter()
    for t in range(steps):
        env.step(actions[t])
    return batch * steps / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 4096, 16384])
    p.add_argument("--steps", type=int, default=300)
    args = p.parse_args()
    for batch in args.batches:
        steps = max(args.steps // max(batch // 4096, 1), 30)
        for name, fn in (
            ("taxi", lambda b, s: bench_taxi(b, s)),
            ("hansen_taxi", lambda b, s: bench_taxi(b, s, hansen=True)),
            ("rooms_hansen", bench_rooms),
            ("crooms_velocity", bench_crooms),
            ("car_flag", bench_car_flag),
            ("msrooms_hansen_3floor", bench_msrooms),
        ):
            sps = fn(batch, steps)
            print(
                json.dumps(
                    {
                        "env": f"reference/{name}",
                        "batch": batch,
                        "steps_per_s": round(sps),
                        "device": "cpu-numpy",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
