"""Scene generators (3D) for the all-pairs demo path.

Re-implements the reference GPU program's scene math
(``src/main/kotlin/gpu/GPU.kt``):

* :func:`generate_sphere` — ``generateSphere`` (lines 508-548): bodies in a
  ball (r ~ rMax * cbrt(u)), tangential speeds 300000/max(10, r) via a
  cross-product frame, plus one central body of mass 5e6.
* :func:`generate_disk3d` — ``generateDisk`` (lines 479-498): 2D disk with
  z in [1, 11), tangential speed 50/max(10, r), mass in [1, 3).
* :func:`make_galaxy_disk3d` — the 3D float clone of makeGalaxyDisk
  (lines 575-652), z = 0 plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_nbody import config as cfg
from tpu_nbody.models import scenes as scenes2d


def generate_sphere(key, n, *, w=cfg.GPU_WIDTH_PX, h=cfg.GPU_HEIGHT_PX,
                    central_mass=5_000_000.0, speed_const=300_000.0,
                    dtype=jnp.float32):
    """Ball of ``n`` satellites + one central mass (GPU demo default scene)."""
    c = jnp.asarray([w * 0.5, h * 0.5, min(w, h) * 0.5], dtype)
    r_max = min(w, h) * 0.45
    ku, kz, kphi = jax.random.split(key, 3)
    r = r_max * jnp.cbrt(jax.random.uniform(ku, (n,), dtype))
    z = jax.random.uniform(kz, (n,), dtype) * 2.0 - 1.0
    phi = jax.random.uniform(kphi, (n,), dtype) * 2.0 * jnp.pi
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    rdir = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), z], axis=-1)
    pos = c + r[:, None] * rdir
    speed = speed_const / jnp.maximum(10.0, r)
    # Tangential direction: cross(rdir, axis) with axis flipped near poles
    # (GPU.kt:536-540).
    near_pole = jnp.abs(z) > 0.99
    axis = jnp.stack([jnp.where(near_pole, 1.0, 0.0),
                      jnp.where(near_pole, 0.0, 1.0),
                      jnp.zeros_like(z)], axis=-1)
    t = jnp.cross(rdir, axis)
    t = t / jnp.maximum(1e-8, jnp.linalg.norm(t, axis=-1, keepdims=True))
    vel = t * speed[:, None]
    pos = jnp.concatenate([pos, c[None]])
    vel = jnp.concatenate([vel, jnp.zeros((1, 3), dtype)])
    mass = jnp.concatenate([jnp.ones((n,), dtype),
                            jnp.asarray([central_mass], dtype)])
    return pos, vel, mass


def generate_disk3d(key, n, *, w=cfg.GPU_WIDTH_PX, h=cfg.GPU_HEIGHT_PX,
                    dtype=jnp.float32):
    """Thin 3D disk, r ~ rMax*sqrt(u), z in [1, 11), m in [1, 3)."""
    c = jnp.asarray([w * 0.5, h * 0.5], dtype)
    r_max = min(w, h) * 0.45
    kr, ka, kz, km = jax.random.split(key, 4)
    r = r_max * jnp.sqrt(jax.random.uniform(kr, (n,), dtype))
    a = jax.random.uniform(ka, (n,), dtype) * 2.0 * jnp.pi
    z = 1.0 + jax.random.uniform(kz, (n,), dtype) * 10.0
    xy = c + r[:, None] * jnp.stack([jnp.cos(a), jnp.sin(a)], axis=-1)
    pos = jnp.concatenate([xy, z[:, None]], axis=-1)
    v = 50.0 / jnp.maximum(10.0, r)
    vel = jnp.stack([-v * jnp.sin(a), v * jnp.cos(a), jnp.zeros_like(v)], axis=-1)
    mass = 1.0 + jax.random.uniform(km, (n,), dtype) * 2.0
    return pos, vel, mass


def make_galaxy_disk3d(key, n_total, *, x=None, y=None, r=200.0,
                       min_r=cfg.GPU_MIN_R, central_mass=cfg.GPU_CENTRAL_MASS,
                       total_satellite_mass=cfg.GPU_TOTAL_SATELLITE_MASS,
                       G=cfg.G_DEFAULT, w=cfg.GPU_WIDTH_PX,
                       h=cfg.GPU_HEIGHT_PX, dtype=jnp.float32, **kw):
    """3D (z=0 plane) galaxy disk — the GPU demo's unused generator."""
    x = w * 0.5 if x is None else x
    y = h * 0.5 if y is None else y
    pos2, vel2, mass = scenes2d.make_galaxy_disk(
        key, n_total, x=x, y=y, r=r, min_r=min_r, central_mass=central_mass,
        total_satellite_mass=total_satellite_mass, G=G, world_w=w, world_h=h,
        dtype=dtype, **kw)
    z = jnp.zeros((pos2.shape[0], 1), dtype)
    return (jnp.concatenate([pos2, z], axis=-1),
            jnp.concatenate([vel2, z], axis=-1), mass)
