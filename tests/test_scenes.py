"""Scene generator tests: structure, physics, and oracle math parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody import config as cfg
from tpu_nbody.models import scenes, scenes3d


def test_kepler_disk_structure():
    p, v, m = scenes.make_kepler_disk(jax.random.PRNGKey(3), 2000)
    assert p.shape == (2000, 2) and v.shape == (2000, 2) and m.shape == (2000,)
    # body 0 is the central mass at the disk center with zero drift
    np.testing.assert_allclose(p[0], [cfg.WIDTH_PX / 2, cfg.HEIGHT_PX / 2])
    np.testing.assert_allclose(v[0], [0.0, 0.0])
    assert m[0] == cfg.CENTRAL_MASS
    # satellite masses sum to TOTAL_SATELLITE_MASS
    np.testing.assert_allclose(m[1:].sum(), cfg.TOTAL_SATELLITE_MASS, rtol=1e-5)
    # radii within [MIN_R*(1-jitter), rmax*(1+jitter)]
    r = np.linalg.norm(np.asarray(p[1:]) - np.asarray(p[0]), axis=-1)
    rmax = min(cfg.WIDTH_PX, cfg.HEIGHT_PX) * 0.38
    assert r.min() >= cfg.MIN_R * 0.96
    assert r.max() <= rmax * 1.04


def test_kepler_circular_velocity_matches_enclosed_mass():
    """v = sqrt(G*M_enc/r) within the 1% speed jitter, tangential."""
    p, v, m = scenes.make_kepler_disk(jax.random.PRNGKey(0), 500,
                                      speed_jitter=0.0, radial_jitter=0.0)
    p, v, m = map(np.asarray, (p, v, m))
    c = p[0]
    r = np.linalg.norm(p - c, axis=-1)
    order = np.argsort(r, kind="stable")
    menc = np.zeros_like(m)
    menc[order] = np.cumsum(m[order])
    vexp = np.sqrt(cfg.G_DEFAULT * menc[1:] / np.maximum(r[1:], 1e-6))
    vgot = np.linalg.norm(v[1:], axis=-1)
    np.testing.assert_allclose(vgot, vexp, rtol=1e-4)
    # tangential: v . r_hat ~ 0, clockwise (cross product sign)
    d = (p[1:] - c) / r[1:, None]
    radial = np.abs(np.sum(v[1:] * d, axis=-1))
    assert radial.max() < 1e-2 * vgot.max()
    cross = d[:, 0] * v[1:, 1] - d[:, 1] * v[1:, 0]
    assert (cross < 0).all()  # clockwise convention: t = (dy, -dx)


def test_galaxy_disk_matches_numpy_oracle_math():
    """Feed identical uniforms to the JAX core and a NumPy transliteration."""
    rng = np.random.default_rng(7)
    sats = 300
    u_r, u_ang, u_v = (rng.random(sats).astype(np.float32) for _ in range(3))
    x, y, r, min_r, G = 1200.0, 400.0, 200.0, 8.0, 80.0
    cm, tsm = 50_000.0, 5_000.0
    p, v, m = scenes.galaxy_disk_from_uniforms(
        jnp.asarray(u_r), jnp.asarray(u_ang), jnp.asarray(u_v),
        x=x, y=y, r=r, min_r=min_r, central_mass=cm,
        total_satellite_mass=tsm, G=G)

    # NumPy oracle of the same math (BodyFactory.kt:63-150)
    Rd, taper_r = r / 3.0, r * 0.6
    A = np.exp(-(r - min_r) / Rd)
    R = min_r - Rd * np.log(1 - u_r.astype(np.float64) * (1 - A))
    th = u_ang.astype(np.float64) * 2 * np.pi
    taper = np.exp(-(R / taper_r) ** 2)
    R2 = R * (1 + 0.03 * np.cos(2 * th) * taper)
    px = x + R2 * np.cos(th)
    py = y + R2 * np.sin(th)
    pos = np.concatenate([[[x, y]], np.stack([px, py], -1)])
    mass = np.concatenate([[cm], np.full(sats, tsm / sats)])
    rr = np.linalg.norm(pos - [x, y], axis=-1)
    order = np.argsort(rr, kind="stable")
    menc = np.zeros_like(mass)
    menc[order] = np.cumsum(mass[order])
    rr = np.maximum(rr, 1e-6)
    vc = np.sqrt(G * menc / rr) * (1 + (np.concatenate([[0.5], u_v]) - 0.5) * 0.02)
    vel = np.stack([pos[:, 1] - y, -(pos[:, 0] - x)], -1) / rr[:, None] * vc[:, None]
    vel[0] = 0.0

    np.testing.assert_allclose(np.asarray(p), pos, rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v), vel, rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(m), mass, rtol=1e-6)


def test_uniform_cloud():
    p, v, m = scenes.make_uniform_cloud(jax.random.PRNGKey(1), 1000, 0.5)
    p = np.asarray(p)
    assert (p[:, 0] >= 0).all() and (p[:, 0] < cfg.WIDTH_PX).all()
    assert (p[:, 1] >= 0).all() and (p[:, 1] < cfg.HEIGHT_PX).all()
    assert (np.asarray(v) == 0).all()
    assert (np.asarray(m) == 0.5).all()


def test_default_two_disk_scene():
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(0),
                                            n1=1000, n2=250)
    assert p.shape == (1250, 2)
    m = np.asarray(m)
    assert m[0] == 50_000.0 and m[1000] == 5_000.0
    # disk 2 drifts at vx=-50 (its central body)
    np.testing.assert_allclose(np.asarray(v)[1000], [-50.0, 0.0], atol=1e-5)


def test_sphere3d():
    p, v, m = scenes3d.generate_sphere(jax.random.PRNGKey(0), 500)
    assert p.shape == (501, 3)
    m = np.asarray(m)
    assert m[-1] == 5_000_000.0 and (m[:-1] == 1.0).all()
    c = np.asarray(p)[-1]
    r = np.linalg.norm(np.asarray(p)[:-1] - c, axis=-1)
    rmax = min(cfg.GPU_WIDTH_PX, cfg.GPU_HEIGHT_PX) * 0.45
    assert r.max() <= rmax * 1.001
    # tangential velocity: v . r_hat == 0, |v| = 300000/max(10, r)
    rhat = (np.asarray(p)[:-1] - c) / np.maximum(r, 1e-9)[:, None]
    vv = np.asarray(v)[:-1]
    assert np.abs(np.sum(vv * rhat, axis=-1)).max() < 1e-1
    np.testing.assert_allclose(np.linalg.norm(vv, axis=-1),
                               300_000.0 / np.maximum(10.0, r), rtol=1e-3)


def test_galaxy_disk3d_flat():
    p, v, m = scenes3d.make_galaxy_disk3d(jax.random.PRNGKey(0), 300)
    assert p.shape == (300, 3)
    assert (np.asarray(p)[:, 2] == 0).all() and (np.asarray(v)[:, 2] == 0).all()
