"""Host-side renderer tests: glyph blitting + labeled taxi frames.

Reference capability: cv2-based ``draw_text_at`` (render_utils.py:36-61) and
the taxi character overlay (extended_taxi.py:289-342).  Ours is pure NumPy,
so the output is deterministic and directly assertable.
"""

import numpy as np
import pytest

import jax

import gym_po_tpu as gpt
from gym_po_tpu.render import render_taxi
from gym_po_tpu.render.glyphs import GLYPH_H, GLYPH_W, draw_text_at, text_size


def test_draw_text_writes_glyph_pixels():
    img = np.zeros((20, 40, 3), np.uint8)
    draw_text_at(img, "T", (2, 3), (255, 0, 0))
    # 'T': full top row at y=3, x=2..6
    assert (img[3, 2:7] == (255, 0, 0)).all()
    # stem below, flanks empty
    assert (img[6, 4] == (255, 0, 0)).all()
    assert (img[6, 2] == 0).all() and (img[6, 6] == 0).all()


def test_draw_text_scale_and_size():
    h, w = text_size("AB", scale=2)
    assert h == GLYPH_H * 2
    assert w == (2 * (GLYPH_W + 1) - 1) * 2
    img = np.zeros((30, 40, 3), np.uint8)
    draw_text_at(img, "A", (0, 0), (9, 9, 9), scale=2)
    assert (img == 9).any()


def test_draw_text_clips_at_frame_edges():
    img = np.zeros((8, 8, 3), np.uint8)
    # partially off every edge: must not raise, must not wrap around
    draw_text_at(img, "W", (-3, -4), (255, 255, 255))
    draw_text_at(img, "W", (6, 6), (255, 255, 255))
    draw_text_at(img, "W", (100, 100), (255, 255, 255))
    assert img.shape == (8, 8, 3)


def test_draw_text_unknown_char_falls_back():
    img = np.zeros((10, 10, 3), np.uint8)
    draw_text_at(img, "~", (1, 1), (7, 7, 7))  # renders the '?' glyph
    assert (img == 7).any()


def test_taxi_render_has_landmark_and_status_glyphs():
    from gym_po_tpu.maps.taxi_maps import decode_state_np

    env = gpt.make("Taxi-v4")
    _, state = env.reset_vec(jax.random.PRNGKey(0), 4)
    img = render_taxi(env, state, idx=[0])
    t = env.tables
    px = 16
    r, c, p, d = decode_state_np(np.asarray(state.s)[:1].astype(np.int64),
                                 t.cols, t.nlocs)
    # cells whose landmark letter is overdrawn by the D/P/taxi overlays
    occupied = {(int(r[0]), int(c[0])), tuple(t.np_locs[int(d[0])])}
    if int(p[0]) < t.nlocs:
        occupied.add(tuple(t.np_locs[int(p[0])]))
    # landmark letters drawn in (120,120,130) on every uncovered landmark cell
    for li in range(t.nlocs):
        ly, lx = t.np_locs[li]
        if (ly, lx) in occupied:
            continue
        cell = img[ly * px : (ly + 1) * px, lx * px : (lx + 1) * px]
        assert (cell == np.array([120, 120, 130])).all(-1).any(), (
            f"no landmark glyph at loc {li}"
        )
    # taxi status glyph: black 'T'/'F' pixels inside the taxi cell
    cell = img[int(r[0]) * px : (int(r[0]) + 1) * px,
               int(c[0]) * px : (int(c[0]) + 1) * px]
    assert (cell == 0).all(-1).any(), "no status glyph on the taxi cell"
    # destination 'D' in white on the destination cell
    dy, dx = t.np_locs[int(d[0])]
    cell = img[dy * px : (dy + 1) * px, dx * px : (dx + 1) * px]
    assert (cell == 255).all(-1).any(), "no D glyph on the destination cell"


def test_ant_render_frames_and_np_fk_parity():
    """render_ant draws both ant envs; its NumPy FK mirror matches the
    engine's jax FK exactly (same tree, same quaternion algebra)."""
    import jax
    import jax.numpy as jnp

    import gym_po_tpu as gpt
    from gym_po_tpu.physics.dynamics import fk
    from gym_po_tpu.render.renderers import COLORS, _np_fk, render_ant

    for name in ("AntTagPhysics-v0", "AntHeavenHellPhysics-v0"):
        env = gpt.make(name, frame_skip=1, solver_iters=2)
        key = jax.random.PRNGKey(0)
        obs, state = env.reset_vec(key, 2)
        # random pose so legs actually articulate in the frame
        qpos = state.qpos.at[:, 7:].add(
            jax.random.uniform(key, (2, 8), jnp.float32, -0.5, 0.5)
        )
        state = state.replace(qpos=qpos)
        img = render_ant(env, state, idx=[0, 1])
        assert img.dtype == np.uint8 and img.ndim == 3
        assert (img.reshape(-1, 3) == COLORS["agent"]).all(-1).any()
        assert (img.reshape(-1, 3) == COLORS["wall"]).all(-1).any()
        # FK mirror parity
        q0 = np.asarray(qpos[0], np.float64)
        xp_np, xm_np = _np_fk(env.model, q0)
        xp_jax, xq_jax = fk(env.model, jnp.asarray(q0))
        np.testing.assert_allclose(xp_np, np.asarray(xp_jax), atol=1e-5)
        # dispatch integration
        from gym_po_tpu.render import render
        assert render(env, state, idx=[0]).ndim == 3


def test_ant_mujoco_scene_render():
    """render_ant_scene drives a headless mujoco.Renderer from fetched
    qpos (the reference's own render path, ant_tag.py:27-75).  Skips when
    mujoco or a GL backend (EGL) is unavailable."""
    import jax

    import gym_po_tpu as gpt
    from gym_po_tpu.render import render_ant_scene

    pytest.importorskip("mujoco")
    env = gpt.make("AntTagPhysics-v0", frame_skip=1, solver_iters=2)
    _, state = env.reset_vec(jax.random.PRNGKey(0), 2)
    try:
        img = render_ant_scene(env, state, idx=[0, 1], width=160, height=120)
    except Exception as e:  # no EGL on this machine
        pytest.skip(f"GL unavailable: {e}")
    assert img.dtype == np.uint8 and img.shape == (120, 320, 3)
    assert img.std() > 1.0  # a real scene, not a blank buffer

    hh = gpt.make("AntHeavenHellPhysics-v0", frame_skip=1, solver_iters=2)
    _, hstate = hh.reset_vec(jax.random.PRNGKey(1), 1)
    img = render_ant_scene(hh, hstate, idx=[0], width=160, height=120)
    assert img.shape == (120, 160, 3) and img.std() > 1.0
