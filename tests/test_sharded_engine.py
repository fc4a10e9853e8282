"""ShardedEngine: panel API on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine
from tpu_nbody.models import scenes
from tpu_nbody.parallel.engine import ShardedEngine
from tpu_nbody.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _cfg(**kw):
    base = dict(capacity=2048, mesh_level=9, mesh_band=64, mesh_chunk=512,
                mesh_rescue=0)
    base.update(kw)
    return SimConfig(**base)


def test_sharded_engine_pm_runs_and_merges(mesh):
    eng = ShardedEngine(_cfg(), Params.default(), mesh=mesh, solver="pm",
                        reshard_every=4)
    eng.reset_default_scene(n1=900, n2=300)
    assert int(eng.state.n_alive()) == 1200
    eng.step(6)                     # crosses a reshard boundary
    assert int(eng.state.n_alive()) == 1200
    assert np.isfinite(np.asarray(eng.state.pos)).all()
    st = eng.stats()
    assert np.isfinite(float(st["energy"]))
    # drop a black hole exactly onto a light body: the merge rule (min_dist
    # 8) must absorb it within a couple of steps
    alive = np.asarray(eng.state.alive)
    light = alive & (np.asarray(eng.state.mass) < 100.0)
    target = np.asarray(eng.state.pos)[light][0]
    eng.add_black_hole(float(target[0]), float(target[1]))
    n_before = int(eng.state.n_alive())
    eng.step(2)
    assert int(eng.state.n_alive()) < n_before


def test_sharded_engine_allpairs_matches_single_device(mesh):
    params = Params.default(merge_min_dist=0.0)  # merge off: exact compare
    cfg = _cfg(capacity=512)
    key = jax.random.PRNGKey(7)
    p, v, m = scenes.make_galaxy_disk(key, 400, r=250.0)

    ref = Engine(cfg, params, solver="allpairs", integrator="kdk")
    ref.set_bodies(p, v, m)
    ref.step(3)

    se = ShardedEngine(cfg, params, mesh=mesh, solver="allpairs",
                       integrator="kdk")
    se.set_bodies(p, v, m)
    se.step(3)

    # sharded engine reorders bodies (Hilbert reshard); compare as sets by
    # sorting on position
    a = np.asarray(ref.state.pos)[np.asarray(ref.state.alive)]
    b = np.asarray(se.state.pos)[np.asarray(se.state.alive)]
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)


def test_sharded_engine_heavy_cap_grows(mesh):
    """More heavies than heavy_cap_local: the block reruns with a grown cap
    and no absorber is dropped (VERDICT round-2 item 6, sharded side)."""
    cfg = _cfg(capacity=512)
    eng = ShardedEngine(cfg, Params.default(merge_min_dist=10.0),
                        mesh=mesh, solver="allpairs", heavy_cap_local=2)
    key = jax.random.PRNGKey(1)
    # 40 heavies (mass >> merge_max_mass) + light satellites right on top
    hp = jax.random.uniform(key, (40, 2), jnp.float32, 300.0, 900.0)
    lp = hp + 1.0                       # within merge_min_dist of a heavy
    pos = jnp.concatenate([hp, lp])
    vel = jnp.zeros_like(pos)
    mass = jnp.concatenate([jnp.full((40,), 6000.0),
                            jnp.full((40,), 1.0)])
    eng.set_bodies(pos, vel, mass)
    eng.step(1)
    assert eng.heavy_cap_local >= 40    # grew past the initial 2
    # every light body adjacent to a heavy was absorbed
    alive = np.asarray(eng.state.alive)
    m = np.asarray(eng.state.mass)
    assert (m[alive] > 100.0).all()


def test_sharded_engine_multi_reshard_with_merging(mesh):
    """Long run crossing MULTIPLE device-side reshard boundaries with
    merging on (VERDICT r2 items 6/7): domains migrate, bodies merge, and
    total mass + alive-mass momentum must survive every reshard exactly
    (the reshard is a pure permutation; merging conserves both)."""
    eng = ShardedEngine(_cfg(), Params.default(merge_min_dist=4.0),
                        mesh=mesh, solver="pm", reshard_every=3)
    eng.reset_default_scene(n1=900, n2=300)
    m0 = np.asarray(eng.state.mass)[np.asarray(eng.state.alive)]
    mass0 = float(m0.sum())
    n0 = int(eng.state.n_alive())

    eng.step(10)                    # 3 in-loop (device-side) reshards

    alive = np.asarray(eng.state.alive)
    mass = np.asarray(eng.state.mass)[alive]
    assert np.isfinite(np.asarray(eng.state.pos)[alive]).all()
    assert int(eng.state.n_alive()) <= n0
    np.testing.assert_allclose(mass.sum(), mass0, rtol=1e-5)


def test_multi_galaxy_merger_scene():
    p, v, m = scenes.multi_galaxy_merger(jax.random.PRNGKey(0),
                                         n_total=4000, n_galaxies=4)
    assert p.shape == (4000, 2) and m.shape == (4000,)
    # four distinct clusters on the ring: their centers are far apart
    centers = p.reshape(4, 1000, 2).mean(axis=1)
    d01 = float(jnp.linalg.norm(centers[0] - centers[1]))
    assert d01 > 100.0
    # total infall momentum roughly cancels (symmetric ring)
    mom = jnp.sum(m[:, None] * v, axis=0) / jnp.sum(m)
    assert float(jnp.linalg.norm(mom)) < 20.0
