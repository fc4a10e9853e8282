"""Scene generators (2D): Kepler disk, galaxy disk, uniform cloud.

Re-implements the reference scene factory math as pure functions of uniform
random draws (reference: ``src/main/kotlin/BodyFactory.kt``):

* :func:`make_kepler_disk`   — ``BodyFactory.makeKeplerDisk`` (lines 11-61)
* :func:`make_galaxy_disk`   — ``BodyFactory.makeGalaxyDisk`` (lines 63-150)
* :func:`make_uniform_cloud` — ``BodyFactory.makeUniformRandom`` (lines 160-177)
* :func:`default_two_disk_scene` — the R-key reset scene
  (``src/main/kotlin/NBodyPanel.kt:83-100``): a 10k-body galaxy disk plus a
  2.5k-body disk offset to y=0.2*H drifting at vx=-50.

Each generator is split into a ``*_from_uniforms`` core (deterministic math
given uniform draws, unit-testable against a NumPy oracle) and a thin wrapper
that draws the uniforms from a ``jax.random`` key. Body 0 of each disk is the
central mass, matching the reference layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_nbody import config as cfg


def _enclosed_mass(pos, mass, center):
    """Exact per-body enclosed mass via sort-by-radius + cumulative sum.

    Mirrors ``BodyFactory.kt:43-47,119-123``: M_enc[i] = sum of masses of all
    bodies with radius <= r_i in the radius sort order (stable; the central
    body at r=0 sorts first and is therefore included in every M_enc).
    """
    r = jnp.linalg.norm(pos - center, axis=-1)
    order = jnp.argsort(r, stable=True)
    csum = jnp.cumsum(mass[order])
    menc = jnp.zeros_like(csum).at[order].set(csum)
    return menc, r


def _circularize(pos, mass, center, G, clockwise, speed_jitter_u,
                 drift, radial_jitter_u=None, radial_jitter=0.0,
                 speed_jitter=0.01):
    """Assign tangential circular-orbit velocities from the enclosed mass.

    v_circ = sqrt(G * M_enc / r), jittered by ±speed_jitter, direction
    (dy/r, -dx/r) for clockwise rotation (``BodyFactory.kt:49-59,126-147``).
    Row 0 (the central body) keeps its preset drift velocity.
    """
    menc, r = _enclosed_mass(pos, mass, center)
    d = pos - center
    rr = jnp.maximum(1e-6, jnp.linalg.norm(d, axis=-1))
    v_circ = jnp.sqrt(G * menc / rr)
    v = v_circ * (1.0 + (speed_jitter_u - 0.5) * 2.0 * speed_jitter)
    dx, dy = d[:, 0], d[:, 1]
    tx = jnp.where(clockwise, dy / rr, -dy / rr)
    ty = jnp.where(clockwise, -dx / rr, dx / rr)
    vel = jnp.stack([tx * v, ty * v], axis=-1)
    if radial_jitter > 0.0 and radial_jitter_u is not None:
        vr = (radial_jitter_u - 0.5) * 2.0 * radial_jitter * v_circ
        vel = vel + d / rr[:, None] * vr[:, None]
    vel = vel + jnp.asarray(drift, pos.dtype)
    # central body: drift only
    vel = vel.at[0].set(jnp.asarray(drift, pos.dtype))
    return vel


def kepler_disk_from_uniforms(u_r, u_rj, u_ang, u_v, *, x, y, r, min_r,
                              central_mass, total_satellite_mass, G,
                              clockwise=True, radial_jitter=0.03,
                              speed_jitter=0.01, vx=0.0, vy=0.0):
    """Deterministic core of the Kepler disk given uniform draws in [0,1).

    Radial sampling is uniform-in-area: rr = sqrt(u*(rMax^2 - minR^2) + minR^2)
    with ±3% radial jitter (``BodyFactory.kt:33-41``).
    """
    sats = u_r.shape[0]
    center = jnp.asarray([x, y], u_r.dtype)
    rr = jnp.sqrt(u_r * (r * r - min_r * min_r) + min_r * min_r)
    rj = rr * (1.0 + (u_rj - 0.5) * 2.0 * radial_jitter)
    ang = u_ang * 2.0 * jnp.pi
    sat_pos = center + rj[:, None] * jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    m_sat = jnp.where(sats > 0, total_satellite_mass / jnp.maximum(sats, 1), 0.0)
    pos = jnp.concatenate([center[None], sat_pos], axis=0)
    mass = jnp.concatenate([jnp.asarray([central_mass], u_r.dtype),
                            jnp.full((sats,), m_sat, u_r.dtype)])
    u_v_all = jnp.concatenate([jnp.asarray([0.5], u_r.dtype), u_v])
    vel = _circularize(pos, mass, center, G, clockwise, u_v_all,
                       (vx, vy), speed_jitter=speed_jitter)
    return pos, vel, mass


def make_kepler_disk(key, n_total, *, x=None, y=None, r=None,
                     min_r=cfg.MIN_R, central_mass=cfg.CENTRAL_MASS,
                     total_satellite_mass=cfg.TOTAL_SATELLITE_MASS,
                     G=cfg.G_DEFAULT, clockwise=True, radial_jitter=0.03,
                     speed_jitter=0.01, vx=0.0, vy=0.0,
                     world_w=cfg.WIDTH_PX, world_h=cfg.HEIGHT_PX,
                     dtype=jnp.float32):
    """Kepler disk: central mass + satellites on circular orbits.

    Defaults match ``BodyFactory.makeKeplerDisk`` (``BodyFactory.kt:11-22``):
    center at (W/2, H/2), rMax = 0.38*min(W, H).
    """
    x = world_w * 0.5 if x is None else x
    y = world_h * 0.5 if y is None else y
    r = min(world_w, world_h) * 0.38 if r is None else r
    sats = max(n_total - 1, 0)
    ks = jax.random.split(key, 4)
    u = [jax.random.uniform(k, (sats,), dtype) for k in ks]
    return kepler_disk_from_uniforms(
        u[0], u[1], u[2], u[3], x=x, y=y, r=r, min_r=min_r,
        central_mass=central_mass, total_satellite_mass=total_satellite_mass,
        G=G, clockwise=clockwise, radial_jitter=radial_jitter,
        speed_jitter=speed_jitter, vx=vx, vy=vy)


def galaxy_disk_from_uniforms(u_r, u_ang, u_v, *, x, y, r, min_r,
                              central_mass, total_satellite_mass, G,
                              eps_m2=0.03, phi0=0.0, bar_taper_r=None,
                              radial_scale=None, speed_jitter=0.01,
                              radial_jitter=0.0, u_vr=None, clockwise=True,
                              vx=0.0, vy=0.0):
    """Deterministic core of the galaxy disk given uniform draws.

    * Exponential surface profile with scale Rd = r/3 via inverse CDF on
      [min_r, r]: R = min_r - Rd*ln(1 - u*(1 - exp(-(r-min_r)/Rd)))
      (``BodyFactory.kt:97-102``).
    * m=2 bar perturbation: R' = R*(1 + eps*cos(2*(theta-phi0))*exp(-(R/taper)^2))
      with taper = 0.6*r (``BodyFactory.kt:105-116``).
    * Exact enclosed-mass circularization as in the Kepler disk.
    """
    sats = u_r.shape[0]
    center = jnp.asarray([x, y], u_r.dtype)
    Rd = (r / 3.0) if radial_scale is None else radial_scale
    taper_r = (r * 0.6) if bar_taper_r is None else bar_taper_r
    A = jnp.exp(-(r - min_r) / Rd)
    t = 1.0 - u_r * (1.0 - A)
    R = min_r - Rd * jnp.log(t)
    theta = u_ang * 2.0 * jnp.pi
    taper = jnp.exp(-(R / taper_r) ** 2)
    R2 = R * (1.0 + eps_m2 * jnp.cos(2.0 * (theta - phi0)) * taper)
    sat_pos = center + R2[:, None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    m_sat = jnp.where(sats > 0, total_satellite_mass / jnp.maximum(sats, 1), 0.0)
    pos = jnp.concatenate([center[None], sat_pos], axis=0)
    mass = jnp.concatenate([jnp.asarray([central_mass], u_r.dtype),
                            jnp.full((sats,), m_sat, u_r.dtype)])
    u_v_all = jnp.concatenate([jnp.asarray([0.5], u_r.dtype), u_v])
    u_vr_all = None
    if u_vr is not None:
        u_vr_all = jnp.concatenate([jnp.asarray([0.5], u_r.dtype), u_vr])
    vel = _circularize(pos, mass, center, G, clockwise, u_v_all, (vx, vy),
                       radial_jitter_u=u_vr_all, radial_jitter=radial_jitter,
                       speed_jitter=speed_jitter)
    return pos, vel, mass


def make_galaxy_disk(key, n_total, *, x=None, y=None, r=200.0,
                     min_r=cfg.MIN_R, central_mass=cfg.CENTRAL_MASS,
                     total_satellite_mass=cfg.TOTAL_SATELLITE_MASS,
                     G=cfg.G_DEFAULT, eps_m2=0.03, phi0=0.0,
                     bar_taper_r=None, radial_scale=None, speed_jitter=0.01,
                     radial_jitter=0.0, clockwise=True, vx=0.0, vy=0.0,
                     world_w=cfg.WIDTH_PX, world_h=cfg.HEIGHT_PX,
                     dtype=jnp.float32):
    """Galaxy disk with exponential profile and m=2 bar perturbation.

    Defaults match ``BodyFactory.makeGalaxyDisk`` (``BodyFactory.kt:63-82``).
    """
    x = world_w * 0.5 if x is None else x
    y = world_h * 0.5 if y is None else y
    sats = max(n_total - 1, 0)
    ks = jax.random.split(key, 4)
    u = [jax.random.uniform(k, (sats,), dtype) for k in ks]
    return galaxy_disk_from_uniforms(
        u[0], u[1], u[2], x=x, y=y, r=r, min_r=min_r,
        central_mass=central_mass, total_satellite_mass=total_satellite_mass,
        G=G, eps_m2=eps_m2, phi0=phi0, bar_taper_r=bar_taper_r,
        radial_scale=radial_scale, speed_jitter=speed_jitter,
        radial_jitter=radial_jitter, u_vr=u[3] if radial_jitter > 0 else None,
        clockwise=clockwise, vx=vx, vy=vy)


def make_uniform_cloud(key, n, m=0.5, *, world_w=cfg.WIDTH_PX,
                       world_h=cfg.HEIGHT_PX, dtype=jnp.float32):
    """Uniform zero-velocity cloud over the window.

    ``BodyFactory.makeUniformRandom`` (``BodyFactory.kt:160-177``); the C key
    adds 5000 bodies of mass 0.5 (``NBodyPanel.kt:282-286``).
    """
    u = jax.random.uniform(key, (n, 2), dtype)
    pos = u * jnp.asarray([world_w, world_h], dtype)
    return pos, jnp.zeros_like(pos), jnp.full((n,), m, dtype)


def default_two_disk_scene(key, *, n1=10_000, n2=2_500,
                           world_w=cfg.WIDTH_PX, world_h=cfg.HEIGHT_PX,
                           G=cfg.G_DEFAULT, dtype=jnp.float32):
    """The canonical R-reset workload: two-galaxy collision.

    ``NBodyPanel.defaultBodies`` (``NBodyPanel.kt:83-100``): a 10k-body disk
    (r=300, M_c=50k, M_sat=5k) centered in the window plus a 2.5k-body disk
    (r=100, M_c=5k, M_sat=500) at y=0.2*H drifting with vx=-50.
    """
    k1, k2 = jax.random.split(key)
    p1, v1, m1 = make_galaxy_disk(
        k1, n1, r=300.0, central_mass=50_000.0, total_satellite_mass=5_000.0,
        world_w=world_w, world_h=world_h, G=G, dtype=dtype)
    p2, v2, m2 = make_galaxy_disk(
        k2, n2, y=world_h * 0.2, vx=-50.0, r=100.0, central_mass=5_000.0,
        total_satellite_mass=500.0, world_w=world_w, world_h=world_h, G=G,
        dtype=dtype)
    return (jnp.concatenate([p1, p2]), jnp.concatenate([v1, v2]),
            jnp.concatenate([m1, m2]))


def multi_galaxy_merger(key, *, n_total=10_000_000, n_galaxies=4,
                        world_w=cfg.WIDTH_PX, world_h=cfg.HEIGHT_PX,
                        ring_frac=0.30, infall_speed=40.0,
                        G=cfg.G_DEFAULT, dtype=jnp.float32):
    """BASELINE config[4]: several galaxies falling into a common merger.

    ``n_galaxies`` disks (the canonical r=300 / M_c=50k profile, scaled) are
    placed on a ring of radius ``ring_frac * min(W, H)`` around the world
    center, each given an inward + slight tangential velocity so they meet
    near the center within a few hundred steps. No reference counterpart
    (the reference tops out at the 12.5k-body two-disk scene) — this is the
    N-scaling axis workload (SURVEY §5.7).
    """
    per = n_total // n_galaxies
    cx, cy = world_w * 0.5, world_h * 0.5
    ring_r = ring_frac * min(world_w, world_h)
    keys = jax.random.split(key, n_galaxies)
    ps, vs, ms = [], [], []
    for g in range(n_galaxies):
        ang = 2.0 * jnp.pi * g / n_galaxies
        gx = cx + ring_r * float(jnp.cos(ang))
        gy = cy + ring_r * float(jnp.sin(ang))
        # inward + 25% tangential so the merger has angular momentum
        ivx = -infall_speed * float(jnp.cos(ang)) \
            - 0.25 * infall_speed * float(jnp.sin(ang))
        ivy = -infall_speed * float(jnp.sin(ang)) \
            + 0.25 * infall_speed * float(jnp.cos(ang))
        n_g = per + (n_total - per * n_galaxies if g == 0 else 0)
        p, v, m = make_galaxy_disk(
            keys[g], n_g, x=gx, y=gy, r=300.0, central_mass=50_000.0,
            total_satellite_mass=5_000.0, vx=ivx, vy=ivy, phi0=float(ang),
            world_w=world_w, world_h=world_h, G=G, dtype=dtype)
        ps.append(p); vs.append(v); ms.append(m)
    return jnp.concatenate(ps), jnp.concatenate(vs), jnp.concatenate(ms)
