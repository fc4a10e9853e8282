"""Rendering + viewer tests: splat placement, color ramps, PNG/GIF output,
viewport math, HUD key bindings."""

import io
import struct
import zlib

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import Params
from tpu_nbody.ops import render
from tpu_nbody import viewer


def test_splat_positions():
    pos = jnp.asarray([[1.5, 2.5], [10.0, 0.0], [-5.0, 3.0]])
    vel = jnp.zeros((3, 2))
    mass = jnp.ones((3,))
    alive = jnp.asarray([True, True, True])
    fb = render.render_frame(pos, vel, mass, alive, width=16, height=8,
                             mode="classic")
    fb = np.asarray(fb)
    assert fb[2, 1].sum() > 0     # (x=1, y=2)
    assert fb[0, 10].sum() > 0
    assert fb.sum() == pytest.approx(6.0)  # offscreen body dropped, 2 white px


def test_classic_heavy_bodies_black():
    pos = jnp.asarray([[1.0, 1.0], [2.0, 1.0]])
    vel = jnp.zeros((2, 2))
    mass = jnp.asarray([10.0, 5000.0])
    alive = jnp.ones(2, bool)
    fb = np.asarray(render.render_frame(pos, vel, mass, alive, width=4,
                                        height=4, mode="classic"))
    assert fb[1, 1].sum() == pytest.approx(3.0)   # light -> white
    assert fb[1, 2].sum() == pytest.approx(0.0)   # heavy -> black (parity)


def test_mass_scaled_splat_tiers():
    """gpu/GPU.kt:226 point size: light 1px, mid 3x3 disc, heavy 5x5 disc."""
    pos = jnp.asarray([[4.0, 4.0], [16.0, 4.0], [26.0, 4.0]])
    vel = jnp.zeros((3, 2))
    # size = 1 + 1e-3*m -> sizes 1.0 / 3.0 / 5.0 (clamped)
    mass = jnp.asarray([10.0, 2000.0, 10_000.0])
    alive = jnp.ones(3, bool)
    fb = np.asarray(render.render_frame(pos, vel, mass, alive, width=32,
                                        height=9, mode="speed",
                                        size_mass_scale=1e-3))
    lit = (fb.sum(axis=2) > 0)
    assert lit[4, 4] and not lit[3, 4] and not lit[5, 4]     # 1 px
    assert lit[3:6, 15:18].all()                             # 3x3 disc
    assert not lit[2, 14] and not lit[6, 18]
    assert lit[2:7, 24:29].sum() == 21                       # 5x5 minus corners
    assert not lit[2, 24] and not lit[2, 28]                 # corners dark
    # default path unchanged: single pixels
    fb1 = np.asarray(render.render_frame(pos, vel, mass, alive, width=32,
                                         height=9, mode="speed"))
    assert (fb1.sum(axis=2) > 0).sum() == 3


def test_speed_ramp_endpoints():
    v = jnp.asarray([[0.0, 0.0], [10_000.0, 0.0]])
    cols = np.asarray(render.speed_colors(v))
    np.testing.assert_allclose(cols[0], [1, 1, 1], atol=1e-6)  # slow = white
    # fast = 0.77*white + 0.23*(0.65, 0, 0.95)
    np.testing.assert_allclose(cols[1], [0.9195, 0.77, 0.9885], atol=1e-4)


def test_zoom_view_transform():
    pos = jnp.asarray([[100.0, 50.0]])
    fb = np.asarray(render.render_frame(
        pos, jnp.zeros((1, 2)), jnp.ones(1), jnp.ones(1, bool),
        width=32, height=32, view_x=90.0, view_y=40.0, zoom=2.0,
        mode="classic"))
    assert fb[20, 20].sum() > 0  # (100-90)*2 = 20


def test_render3d_runs():
    pos = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
    vel = jnp.ones((2, 3))
    fb = render.render_frame_3d(pos, vel, jnp.ones(2), jnp.ones(2, bool),
                                width=32, height=16, cam_angle=0.3)
    assert np.asarray(fb).shape == (16, 32, 3)


def _png_roundtrip_check(path):
    raw = path.read_bytes()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    # parse IHDR
    ln = struct.unpack(">I", raw[8:12])[0]
    assert raw[12:16] == b"IHDR"
    w, h = struct.unpack(">II", raw[16:24])
    return w, h


def test_write_png(tmp_path):
    img = (np.random.default_rng(0).random((8, 12, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    viewer.write_png(p, img)
    w, h = _png_roundtrip_check(p)
    assert (w, h) == (12, 8)
    # decode IDAT and compare pixels
    raw = p.read_bytes()
    off = 8 + 4 + 4 + 13 + 4  # sig + IHDR chunk (len+type+data+crc)
    ln = struct.unpack(">I", raw[off:off + 4])[0]
    assert raw[off + 4:off + 8] == b"IDAT"
    data = zlib.decompress(raw[off + 8:off + 8 + ln])
    rows = np.frombuffer(data, np.uint8).reshape(8, 1 + 12 * 3)
    assert (rows[:, 0] == 0).all()
    np.testing.assert_array_equal(rows[:, 1:].reshape(8, 12, 3), img)


def test_write_gif(tmp_path):
    rng = np.random.default_rng(0)
    frames = [(rng.random((16, 16, 3)) * 255).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "t.gif"
    viewer.write_gif(p, frames, fps=20)
    raw = p.read_bytes()
    assert raw[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", raw[6:10])
    assert (w, h) == (16, 16)
    assert raw[-1:] == b"\x3b"
    assert raw.count(b"\x21\xf9") == 3  # one GCE per frame


def test_render_movie_fused_scan():
    """One jitted scan produces simulation + frames with no host loop."""
    import jax

    from tpu_nbody.ops import forces, integrate
    from tpu_nbody.state import from_arrays

    pos = jnp.asarray([[10.0, 10.0], [20.0, 10.0]])
    vel = jnp.asarray([[0.0, 20.0], [0.0, -20.0]])  # ~8 px over the movie
    state = from_arrays(pos, vel, jnp.ones((2,)))
    params = Params.default(dt=0.05, merge_min_dist=0.0)

    def accel(p, m, alive, prm):
        return forces.accel_allpairs(p, jnp.where(alive, m, 0.0), prm.G,
                                     prm.soft2, implementation="xla")

    def step(s, prm):
        return integrate.kdk_step(s, prm, accel)

    final, frames = render.render_movie(
        state, params, step, n_frames=4, steps_per_frame=2,
        width=32, height=32, mode="classic")
    assert frames.shape == (4, 32, 32, 3) and frames.dtype == jnp.uint8
    assert int(final.step) == 8
    # bodies moved between first and last frame
    assert not np.array_equal(np.asarray(frames[0]), np.asarray(frames[-1]))
    assert np.asarray(frames).sum() > 0


def test_viewport_math():
    vp = viewer.Viewport(width=800, height=600, world_w=2400, world_h=800)
    assert vp.world_to_screen(100, 50) == (100, 50)
    vp.wheel_zoom(400, 300, +1)
    assert vp.zoom == pytest.approx(1.1)
    wx, wy = vp.screen_to_world(400, 300)
    assert wx == pytest.approx(400, abs=1e-6)  # anchor invariant
    vp.pan(10, 0)
    assert vp.view_x > 0
    # clamp: pan far left
    vp.pan(-1e9, -1e9)
    assert vp.view_x == 0.0 and vp.view_y == 0.0
    # zoom clamp range x1..x10
    for _ in range(100):
        vp.wheel_zoom(0, 0, +1)
    assert vp.zoom <= 10.0
    for _ in range(100):
        vp.wheel_zoom(0, 0, -1)
    assert vp.zoom >= 1.0


def test_hud_key_bindings_clamps():
    hud = viewer.Hud()
    p = Params.default()
    for _ in range(100):
        p = hud.adjust(p, "Z")
    assert float(p.theta) == pytest.approx(0.2)
    for _ in range(100):
        p = hud.adjust(p, "X")
    assert float(p.theta) == pytest.approx(1.6)
    for _ in range(100):
        p = hud.adjust(p, "O")
    assert float(p.dt) == pytest.approx(-0.05)  # time reversal allowed
    for _ in range(200):
        p = hud.adjust(p, "P")
    assert float(p.dt) == pytest.approx(0.05)
    for _ in range(200):
        p = hud.adjust(p, "K")
    assert float(p.G) == 0.0
    for _ in range(200):
        p = hud.adjust(p, "L")
    assert float(p.G) == 100.0
    for _ in range(100):
        hud.adjust(p, "Q")
    assert hud.disk_r == 100.0
    for _ in range(100):
        hud.adjust(p, "W")
    assert hud.disk_r == 500.0
    for _ in range(200):
        hud.adjust(p, "A")
    assert hud.disk_n == 1000
    for _ in range(200):
        hud.adjust(p, "S")
    assert hud.disk_n == 10000
    assert len(hud.lines(p, 123, 1.0, 60.0)) == 13
