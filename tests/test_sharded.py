"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import Params
from tpu_nbody.ops import forces
from tpu_nbody.ops.integrate import kdk_step
from tpu_nbody.ops.merge import merge_bodies
from tpu_nbody.parallel import mesh as mesh_lib
from tpu_nbody.parallel.sharded import make_sharded_step
from tpu_nbody.state import from_arrays


def _scene(rng, n, cap):
    pos = np.zeros((cap, 2), np.float32)
    pos[:n] = rng.random((n, 2)) * 500
    vel = np.zeros((cap, 2), np.float32)
    vel[:n] = rng.standard_normal((n, 2))
    mass = np.zeros(cap, np.float32)
    mass[:n] = rng.random(n) + 0.5
    state = from_arrays(pos, vel, mass, capacity=cap)
    return state._replace(alive=jnp.asarray(np.arange(cap) < n))


def test_mesh_has_8_devices():
    m = mesh_lib.make_mesh()
    assert m.shape["b"] == 8


def test_sharded_step_matches_single_device(rng):
    cap, n = 256, 200
    state = _scene(rng, n, cap)
    params = Params.default(dt=0.002, merge_min_dist=0.0)

    m = mesh_lib.make_mesh()
    sstate = mesh_lib.shard_state(state, m)
    step = make_sharded_step(m)
    out_sharded, _ = step(sstate, params, n_steps=3)

    def accel(pos, mass, alive, p):
        return forces.accel_allpairs(pos, jnp.where(alive, mass, 0.0),
                                     p.G, p.soft2, implementation="xla")

    ref = state
    for _ in range(3):
        ref = kdk_step(ref, params, accel)
        ref, _ = merge_bodies(ref, params)

    np.testing.assert_allclose(np.asarray(out_sharded.pos),
                               np.asarray(ref.pos), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_sharded.vel),
                               np.asarray(ref.vel), rtol=2e-3, atol=2e-3)


def test_sharded_merge_matches_single_device(rng):
    cap = 128
    pos = np.zeros((cap, 2), np.float32)
    pos[:6] = [[10, 10], [12, 10], [14, 10],     # heavy + 2 victims
               [100, 100], [102, 100],           # heavy + victim (other shard
               [300, 300]]                       #  after sharding) + loner
    mass = np.zeros(cap, np.float32)
    mass[:6] = [5000.0, 1.0, 2.0, 6000.0, 3.0, 4.0]
    state = from_arrays(pos, np.zeros_like(pos), mass, capacity=cap)
    state = state._replace(alive=jnp.asarray(np.arange(cap) < 6))
    params = Params.default(dt=0.0, merge_min_dist=8.0)

    m = mesh_lib.make_mesh()
    step = make_sharded_step(m)
    out, need = step(mesh_lib.shard_state(state, m), params, n_steps=1)

    ref = kdk_step(state, params, lambda p, mm, a, pr: jnp.zeros_like(p))
    ref, _ = merge_bodies(ref, params)
    assert int(need) == 2  # both heavies live on shard 0 (slots 0 and 3)
    np.testing.assert_array_equal(np.asarray(out.alive),
                                  np.asarray(ref.alive))
    np.testing.assert_allclose(np.asarray(out.mass), np.asarray(ref.mass),
                               rtol=1e-6)
    assert float(out.mass[0]) == 5003.0 and float(out.mass[3]) == 6003.0


def test_sharded_pm_matches_single_device(rng):
    """Domain-decomposed multi-chip P3M vs single-chip P3M."""
    from tpu_nbody.config import SimConfig
    from tpu_nbody.models import scenes
    from tpu_nbody.ops import mesh as mesh_ops
    from tpu_nbody.parallel.sharded_pm import (make_sharded_pm_step,
                                               reshard_by_hilbert)

    cap, n = 1024, 900
    cfg = SimConfig(capacity=cap, mesh_level=9, mesh_band=32, mesh_chunk=128)
    p, v, mm = scenes.default_two_disk_scene(jax.random.PRNGKey(1),
                                             n1=700, n2=200)
    state = from_arrays(p, v, mm, capacity=cap)
    params = Params.default(dt=0.002, merge_min_dist=0.0)

    m = mesh_lib.make_mesh()
    sstate = reshard_by_hilbert(state, m, cfg)
    step = make_sharded_pm_step(m, cfg)
    out, _ = step(sstate, params, n_steps=2)

    # single-chip reference on the SAME (resharded) ordering
    ref_state = jax.device_put(jax.tree.map(np.asarray, sstate))
    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)

    def accel(pos, mass, alive, prm):
        return mesh_ops.pm_accel(pos, mass, alive, prm.G, prm.soft2, origin,
                                 2 * cfg.root_half, mesh_level=cfg.mesh_level,
                                 split_cells=cfg.mesh_split,
                                 band=cfg.mesh_band, chunk=cfg.mesh_chunk)

    ref = ref_state
    for _ in range(2):
        ref = kdk_step(ref, params, accel)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-3, atol=5e-3)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
