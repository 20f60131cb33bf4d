"""Oracle tests for the capsule-box collider vs MuJoCo's ``mjc_CapsuleBox``.

A single free capsule vs one static box (the exact wall geometry family the
ant arenas use: axis-aligned, resting on the floor plane), swept over the
configuration taxonomy the collider was reverse-engineered from:
end-on / angled / parallel face contacts, past-the-end clamping, box-end
edge crossings, under-the-box bottom-edge wedges, and inside-the-box
states.  Contact sets are compared (dist, position, normal) to 1e-6.

Known divergence (documented in contact._capsule_box_slots_s): when the
capsule segment pierces the box surface at a steep angle MuJoCo can emit a
second contact at a surface-crossing feature that we skip — quantified
here by the fuzz lower bound rather than hidden: the curated taxonomy is
exact, random deep-penetration poses match ≥ 75%.
"""

import math

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax
import jax.numpy as jnp

from gym_po_tpu.physics.contact import _capsule_box_slots_s

XML = """
<mujoco>
  <worldbody>
    <geom name="box" type="box" pos="0 0 1" size="0.25 5.25 1"/>
    <body name="cap" pos="0 0 0">
      <freejoint/>
      <geom name="cap" type="capsule" size="0.08" fromto="-0.2 0 0 0.2 0 0"/>
    </body>
  </worldbody>
</mujoco>"""
LO, HI, R = (-0.25, -5.25, 0.0), (0.25, 5.25, 2.0), 0.08


@pytest.fixture(scope="module")
def box_oracle():
    m = mujoco.MjModel.from_xml_string(XML)
    return m, mujoco.MjData(m)


def _quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


@jax.jit
def _slots(p0, p1):
    return _capsule_box_slots_s(tuple(p0), tuple(p1), R, LO, HI)


def _match(m, d, pos, quat, tol=1e-6):
    d.qpos[:3] = pos
    d.qpos[3:7] = quat
    d.qvel[:] = 0
    mujoco.mj_forward(m, d)
    mj = [(c.dist, tuple(c.pos), tuple(-c.frame[:3]))
          for c in (d.contact[i] for i in range(d.ncon))]
    rot = _quat_mat(np.asarray(quat) / np.linalg.norm(quat))
    p0 = jnp.asarray(np.asarray(pos) + rot @ np.array([-0.2, 0, 0]),
                     jnp.float64)
    p1 = jnp.asarray(np.asarray(pos) + rot @ np.array([0.2, 0, 0]),
                     jnp.float64)
    mine = [
        (float(dist), tuple(map(float, pp)), tuple(map(float, n)))
        for dist, n, pp, valid in _slots(tuple(p0), tuple(p1))
        if bool(valid) and float(dist) < 0.0
    ]
    if len(mine) != len(mj):
        return False
    for c1 in mj:
        best = min(
            (max(abs(c1[0] - c2[0]),
                 max(abs(a - b) for a, b in zip(c1[1], c2[1])),
                 max(abs(a - b) for a, b in zip(c1[2], c2[2])))
             for c2 in mine),
            default=np.inf,
        )
        if best > tol:
            return False
    return True


def _zrot(a):
    return (math.cos(a / 2), 0, 0, math.sin(a / 2))


CURATED = (
    [((-0.5, 0, 0.5), (1, 0, 0, 0)),        # end-on into the face
     ((-0.45, 0, 0.5), (1, 0, 0, 0)),
     ((-0.30, 0, 0.5), _zrot(math.pi / 2)),  # parallel: 2 face contacts
     ((-0.31, 0, 0.5), _zrot(math.pi / 2)),
     ((-0.4, 0, 0.5), _zrot(math.pi / 6)),   # angled: endpoint inside
     ((-0.2, 5.4, 0.5), (1, 0, 0, 0)),       # past the end: no contact
     ((0.0, 5.30, 0.5), _zrot(math.pi / 2)),  # deep through the end face
     ((0.0, 0.0, 2.05), _zrot(math.pi / 2)),  # on the top face
     ((-0.30, 0, 0.5), _zrot(math.pi / 2 - 0.1)),   # near-parallel, 2 deep
     ((-0.32, 0, 0.5), _zrot(math.pi / 2 - 0.05)),
     ((-0.30, 5.25, 0.5), (1, 0, 0, 0)),     # endpoint on the end plane
     ((-0.26, 5.30, 0.5), _zrot(math.pi / 4)),   # mid-segment edge contact
     ((-0.30, 5.32, 0.5), _zrot(-math.pi / 4)),  # endpoint inside, straddle
     ((0.0, 5.55, 0.5), _zrot(math.pi / 2)),     # fully past the end
     ((-0.31, 5.2, 0.5), _zrot(math.pi / 2)),    # parallel past the end:
     ((-0.31, 5.35, 0.5), _zrot(math.pi / 2)),   #   face + clamped edge
     ((-0.1, 0, -0.05), (1, 0, 0, 0)),       # wedged under the bottom edge
     ((-0.35, 5.2, 0.5), _zrot(math.pi / 4)),
     ((-0.31, 5.6, 0.5), _zrot(math.pi / 2)),
     ((-0.23, 0, 0.5), _zrot(math.pi / 2)),  # fully inside, parallel
     ((-0.18, 0, 0.5), _zrot(math.pi / 2))]
    + [((-0.31, 0, 0.5), _zrot(math.pi / 2 - a))   # angle sweep off-parallel
       for a in (0.02, 0.05, 0.1, 0.12, 0.15, 0.2, 0.3, 0.4, 0.6, 1.0)]
    + [((-0.31, 5.2, 0.5), _zrot(math.pi / 2 - a))  # past-end angle sweep
       for a in (0.02, 0.05, 0.1, 0.2, 0.4)]
)


def test_curated_taxonomy_exact(box_oracle):
    m, d = box_oracle
    with jax.enable_x64(True):
        bad = [i for i, (pos, quat) in enumerate(CURATED)
               if not _match(m, d, pos, quat)]
        assert not bad, f"curated configs diverged: {bad}"


def test_random_poses_mostly_match(box_oracle):
    """Aggressive random poses (arbitrary orientation, deep penetration):
    lower-bound the match rate instead of hiding the known divergence."""
    m, d = box_oracle
    rng = np.random.default_rng(3)
    with jax.enable_x64(True):
        n_hit = n_ok = 0
        for _ in range(250):
            pos = (rng.uniform(-0.6, -0.1),
                   rng.uniform(4.9, 5.6) if rng.random() < 0.5
                   else rng.uniform(-1, 1),
                   rng.uniform(0.0, 0.8))
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            d.qpos[:3] = pos
            d.qpos[3:7] = q
            mujoco.mj_forward(m, d)
            if d.ncon == 0:
                continue
            n_hit += 1
            n_ok += _match(m, d, pos, tuple(q))
        assert n_hit > 50
        assert n_ok / n_hit >= 0.75, f"{n_ok}/{n_hit}"
