"""F_long subcycling + heavy-direct tests (ops/mesh.py pm_mesh_state,
engine._make_pm_subcycled_step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import SimConfig
from tpu_nbody.engine import Engine
from tpu_nbody.ops import forces, mesh


def _origin_side(cfg):
    return ((cfg.root_center[0] - cfg.root_half,
             cfg.root_center[1] - cfg.root_half), 2 * cfg.root_half)


def _central_scene(rng, cap, n, central_mass=50_000.0):
    """A disk of light satellites around one heavy central (the reference's
    default-scene mass hierarchy, Config.kt CENTRAL_MASS)."""
    cfg = SimConfig(capacity=cap)
    cx, cy = cfg.root_center
    pos = np.zeros((cap, 2), np.float32)
    r = 60.0 + 500.0 * rng.random(n - 1)
    th = 2 * np.pi * rng.random(n - 1)
    pos[0] = (cx, cy)
    pos[1:n, 0] = cx + r * np.cos(th)
    pos[1:n, 1] = cy + r * np.sin(th)
    mass = np.zeros(cap, np.float32)
    mass[0] = central_mass
    mass[1:n] = 1.0 + rng.random(n - 1).astype(np.float32)
    alive = np.arange(cap) < n
    return cfg, jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(alive)


def _exact(pos, mass, alive, G, soft2):
    m = jnp.where(alive, mass, 0.0)
    return np.asarray(forces.accel_allpairs(pos, m, G, soft2))


def test_heavy_direct_improves_mean_error(rng):
    """heavy_cap > 0 makes the dominant (heavy) force component exact: the
    mean force error vs the exact solver must not regress, and typically
    improves (the central's mesh error was the largest error term on every
    satellite)."""
    cap, n = 2048, 1500
    cfg, pos, mass, alive = _central_scene(rng, cap, n)
    origin, side = _origin_side(cfg)
    G, soft2 = 80.0, 1.0
    kw = dict(mesh_level=8, split_cells=2.5, band=64, chunk=2048,
              rescue_k=4)
    ref = _exact(pos, mass, alive, G, soft2)
    nrm = np.linalg.norm(ref[:n], axis=1) + 1e-12

    a0 = np.asarray(mesh.pm_accel(pos, mass, alive, G, soft2, origin, side,
                                  **kw))
    a1 = np.asarray(mesh.pm_accel(pos, mass, alive, G, soft2, origin, side,
                                  heavy_cap=2, **kw))
    e0 = (np.linalg.norm(a0[:n] - ref[:n], axis=1) / nrm).mean()
    e1 = (np.linalg.norm(a1[:n] - ref[:n], axis=1) / nrm).mean()
    assert e1 <= e0 * 1.05, (e0, e1)
    # the heavy slots must still receive forces (they are off the mesh but
    # get mesh force from the lights + direct from other heavies)
    assert np.isfinite(a1[:n]).all()
    # dead slots stay zero
    assert (a1[n:] == 0).all()


def test_mesh_state_prebuilt_matches_inline(rng):
    """pm_accel_sorted(mesh_state=prebuilt) must equal the inline-built
    (mesh_state=None, heavy_cap>0) path bitwise — same ops, staleness 0."""
    cap, n = 1024, 900
    cfg, pos, mass, alive = _central_scene(rng, cap, n)
    origin, side = _origin_side(cfg)
    G, soft2 = 80.0, 1.0
    kw = dict(mesh_level=7, split_cells=3.0, band=64, chunk=1024,
              rescue_k=2)
    spos, smass, salive, _ = mesh._hilbert_sort(pos, mass, alive,
                                                jnp.asarray(origin,
                                                            jnp.float32),
                                                jnp.asarray(side,
                                                            jnp.float32))

    @jax.jit
    def inline(sp, sm, sa):
        return mesh.pm_accel_sorted(sp, sm, sa, G, soft2, origin, side,
                                    heavy_cap=4, **kw)

    @jax.jit
    def prebuilt(sp, sm, sa):
        ms = mesh.pm_mesh_state(sp, sm, sa, soft2, origin, side,
                                mesh_level=kw["mesh_level"],
                                split_cells=kw["split_cells"], heavy_cap=4)
        return mesh.pm_accel_sorted(sp, sm, sa, G, soft2, origin, side,
                                    heavy_cap=4, mesh_state=ms, **kw)

    a, _ = inline(spos, smass, salive)
    b, _ = prebuilt(spos, smass, salive)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_self_term_zero_at_refresh(rng):
    pos = jnp.asarray(rng.random((64, 2)) * 100, jnp.float32)
    m = jnp.asarray(rng.random(64) + 0.5, jnp.float32)
    out = mesh._self_term(pos, pos, m, jnp.float32(1.0), jnp.float32(4.0))
    assert (np.asarray(out) == 0).all()


def test_self_term_cancels_stale_self_image(rng):
    """One body deposited, then displaced: interpolating the stale grid
    yields a spurious pull toward the old position; the analytic self-term
    must cancel most of it."""
    cap = 8
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    cx, cy = cfg.root_center
    pos0 = jnp.zeros((cap, 2)).at[0].set(jnp.asarray([cx, cy]))
    mass = jnp.zeros((cap,)).at[0].set(1000.0)
    alive = jnp.arange(cap) < 1
    soft2 = jnp.float32(1.0)
    lvl, split = 8, 3.0
    h = side / (1 << lvl)
    a = split * h
    ms = mesh.pm_mesh_state(pos0, mass, alive, soft2, origin, side,
                            mesh_level=lvl, split_cells=split)
    # displace by ~a: the stale self-image force is strongest near the
    # split radius
    delta = jnp.asarray([[float(a), 0.0]] + [[0.0, 0.0]] * (cap - 1),
                        jnp.float32)
    pos1 = pos0 + delta
    acc_raw, _ = mesh.pm_accel_sorted(
        pos1, mass, alive, 80.0, soft2, origin, side, mesh_level=lvl,
        split_cells=split, band=4, chunk=8, mesh_state=ms,
        self_correct=False)
    acc_fix, _ = mesh.pm_accel_sorted(
        pos1, mass, alive, 80.0, soft2, origin, side, mesh_level=lvl,
        split_cells=split, band=4, chunk=8, mesh_state=ms,
        self_correct=True)
    # a single body feels zero true force; the raw stale self-image is
    # large, the corrected one at least 5x smaller
    raw = np.abs(np.asarray(acc_raw)[0]).max()
    fix = np.abs(np.asarray(acc_fix)[0]).max()
    assert raw > 0
    assert fix < raw / 5, (raw, fix)


def test_subcycled_engine_tracks_fresh():
    """pm_mesh_every=4 must track the per-step-mesh trajectory closely over
    a resort boundary and a couple of refresh cycles."""
    base = dict(capacity=512, max_depth=7, mesh_level=6, mesh_band=32,
                mesh_chunk=128, mesh_rescue=2, pm_resort_every=3,
                pm_heavy_cap=4)
    a = Engine(SimConfig(**base), solver="pm", integrator="kdk_reuse",
               seed=5)
    b = Engine(SimConfig(**base, pm_mesh_every=4), solver="pm",
               integrator="kdk_reuse", seed=5)
    for e in (a, b):
        e.reset_default_scene(n1=300, n2=100)
    a.step(9)
    b.step(9)
    assert int(b.state.step) == 9
    pa, pb = np.asarray(a.state.pos), np.asarray(b.state.pos)
    alive = np.asarray(a.state.alive)
    scale = np.abs(pa[alive]).max()
    # F_long staleness of <= 3 steps perturbs positions by a tiny fraction
    # of the scene scale (the long-range field is smooth in time)
    assert np.abs(pa - pb)[alive].max() < 2e-4 * scale
    assert np.array_equal(alive, np.asarray(b.state.alive))


def test_subcycled_stream_matches_step():
    """step_stream falls through to step() on the subcycled pm path (no
    seed/carry split) and must produce the identical trajectory."""
    cfg = SimConfig(capacity=512, max_depth=7, mesh_level=6, mesh_band=32,
                    mesh_chunk=128, mesh_rescue=2, pm_heavy_cap=4,
                    pm_mesh_every=2)
    a = Engine(cfg, solver="pm", integrator="kdk_reuse", seed=5)
    b = Engine(cfg, solver="pm", integrator="kdk_reuse", seed=5)
    a.reset_default_scene(n1=300, n2=100)
    b.reset_default_scene(n1=300, n2=100)
    a.step(3)
    b.step_stream(3)
    np.testing.assert_array_equal(np.asarray(a.state.pos),
                                  np.asarray(b.state.pos))


def test_subcycle_guards():
    base = dict(capacity=256, max_depth=6, mesh_level=6, mesh_band=32,
                mesh_chunk=128)
    with pytest.raises(ValueError, match="pm_heavy_cap"):
        Engine(SimConfig(**base, pm_mesh_every=2), solver="pm",
               integrator="kdk_reuse").step(1)
    with pytest.raises(ValueError, match="kdk_reuse"):
        Engine(SimConfig(**base, pm_mesh_every=2, pm_heavy_cap=2),
               solver="pm", integrator="kdk").step(1)
