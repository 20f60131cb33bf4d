"""Accuracy probe for reduced (iters, ls_iters) Newton configurations.

Reproduces the trajectory family of
``tests/test_physics_contact.py::test_f32_default_config_tracks_f64_parity_config``
(120 contact-rich RK4 steps of random flailing from the stand pose) and
reports, for each candidate f32 configuration, the drift vs the f64
iters=15 MuJoCo-parity configuration: max position divergence, deepest
floor-sphere penetration, max |qvel| error.  CPU-runnable (f64 needs the
CPU backend anyway).

    python benchmarks/solver_drift_probe.py [--configs 8:10,8:5,6:6,4:10]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gym_po_tpu.physics import make_ant_model, TAG_WALLS
from gym_po_tpu.physics import contact as con
from gym_po_tpu.physics import dynamics as dyn
from gym_po_tpu.physics import engine as eng

STAND = np.array(
    [0.0, 0.0, 0.55, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, -1.0, 0.0, -1.0,
     0.0, 1.0],
)


def traj(mdl, ctrls, dtype, iters, ls_iters):
    st = eng.init_state(mdl, jnp.asarray(STAND, dtype), jnp.zeros(14, dtype))

    @jax.jit
    def run(st, ctrl):
        def body(s, c):
            s = eng.rk4_step(mdl, s, c, iters=iters, ls_iters=ls_iters)
            return s, (s.qpos, s.qvel)
        return jax.lax.scan(body, st, ctrl)[1]

    qp, qv = run(st, jnp.asarray(ctrls, dtype))
    return np.asarray(qp, np.float64), np.asarray(qv, np.float64)


def deepest(mdl, qp):
    def one(q):
        s = dyn.kinematics(mdl, jnp.asarray(q, jnp.float64)).s
        ds = [c[2] - r for c, b, r, _, _ in con._sphere_centers_s(mdl, s)]
        return jnp.stack([jnp.asarray(x) for x in ds]).min()
    return float(jax.vmap(one)(jnp.asarray(qp)).min())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="8:10,8:5,6:6,4:10")
    ap.add_argument("--steps", type=int, default=120)
    args = ap.parse_args()

    mdl = make_ant_model(TAG_WALLS)
    rng = np.random.default_rng(0)
    ctrls = rng.uniform(-1, 1, (args.steps, 8))

    qp64, qv64 = traj(mdl, ctrls, jnp.float64, 15, 10)
    print(f"f64 iters=15 ls=10 reference: deepest={deepest(mdl, qp64):.4g} "
          f"|qvel|max={np.abs(qv64).max():.3g}")

    for cfg in args.configs.split(","):
        it, ls = (int(x) for x in cfg.split(":"))
        qp, qv = traj(mdl, ctrls, jnp.float32, it, ls)
        dpos = np.abs(qp[:, :3] - qp64[:, :3]).max()
        dvel = np.abs(qv - qv64).max()
        pen = deepest(mdl, qp)
        z = qp[:, 2]
        print(f"f32 iters={it:2d} ls={ls:2d}: "
              f"max|dpos|={dpos:.4g} "
              f"max|dqvel|={dvel:.4g} deepest={pen:.4g} "
              f"z=[{z.min():.3f},{z.max():.3f}] "
              f"finite={np.isfinite(qp).all() and np.isfinite(qv).all()}",
              flush=True)


if __name__ == "__main__":
    main()
