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


def test_cross_shard_rescue_recovers_boundary_pair():
    """Adversarial case (VERDICT r2 item 6): tight clusters just either side
    of the world-center cross — the Hilbert curve's biggest discontinuity —
    land on DIFFERENT shards, so their mutual short-range force is invisible
    to both the ring-halo band and the shard-local rescue. The cross-shard
    rescue exchange must recover it to single-chip accuracy.

    Local deterministic rng (not the session fixture): the scene's shard
    assignment must not depend on test execution order. The single-chip
    reference runs at rescue_k=16 — at k=4 the REFERENCE itself drops one
    of the center-cross pairs for some draws (its own rescue_need is 7
    here) and the then-more-accurate sharded force reads as 0.25 'error'.
    """
    from tpu_nbody.config import SimConfig
    from tpu_nbody.ops import mesh as mesh_ops
    from tpu_nbody.parallel.sharded_pm import (make_sharded_pm_step,
                                               reshard_by_hilbert)
    import dataclasses

    rng = np.random.default_rng(99)
    cap = 1024
    cfg = SimConfig(capacity=cap, mesh_level=9, mesh_band=32, mesh_chunk=128,
                    mesh_rescue=4, mesh_xrescue=8, mesh_xrescue_export=16)
    cx, cy = cfg.root_center
    # uniform background fills all shards with curve mass
    nbg = 920
    pos = np.zeros((cap, 2), np.float32)
    pos[:nbg] = rng.random((nbg, 2)) * [2400, 800]
    mass = np.zeros(cap, np.float32)
    mass[:nbg] = 1.0
    # four 8-body clusters hugging the center cross, one per quadrant
    # (separation ~4-6 << a = 4 * 2404/512 ~ 18.8): cross-quadrant pairs sit
    # at opposite ends of the curve
    nc, off = 8, 2.0
    quads = [(-1, -1), (1, -1), (-1, 1), (1, 1)]
    for q, (sx, sy) in enumerate(quads):
        sl = slice(nbg + q * nc, nbg + (q + 1) * nc)
        pos[sl] = [cx + sx * off, cy + sy * off]
        pos[sl] += rng.random((nc, 2)).astype(np.float32) * 0.5
        mass[sl] = 20.0
    n = nbg + 4 * nc
    state = from_arrays(pos, np.zeros_like(pos), mass, capacity=cap)
    state = state._replace(alive=jnp.asarray(np.arange(cap) < n))
    params = Params.default(dt=1e-3, merge_min_dist=0.0)

    m = mesh_lib.make_mesh()
    sstate = reshard_by_hilbert(state, m, cfg)
    # locate the cluster bodies in the resharded order; they must span
    # multiple shards or the case isn't adversarial
    smass = np.asarray(sstate.mass)
    cl = smass == 20.0
    shard_of = np.arange(cap) // (cap // 8)
    assert len(set(shard_of[cl])) >= 2, "clusters all on one shard"

    # single-chip reference (generous global rescue covers every pair)
    origin = (cx - cfg.root_half, cy - cfg.root_half)
    acc_ref, ref_stats = mesh_ops.pm_accel(
        sstate.pos, sstate.mass, sstate.alive, params.G, params.soft2,
        origin, 2 * cfg.root_half, mesh_level=cfg.mesh_level,
        split_cells=cfg.mesh_split, band=cfg.mesh_band, chunk=cfg.mesh_chunk,
        rescue_k=16, return_stats=True)
    assert int(np.asarray(ref_stats["rescue_need"])) <= 16
    acc_ref = np.asarray(acc_ref)

    def sharded_acc(cfg_used):
        step = make_sharded_pm_step(m, cfg_used, integrator="euler")
        out, stats = step(jax.device_put(sstate), params, n_steps=1)
        return (np.asarray(out.vel) / float(params.dt), stats)

    acc_on, stats = sharded_acc(cfg)
    acc_off, _ = sharded_acc(dataclasses.replace(cfg, mesh_xrescue=0))

    scale = np.linalg.norm(acc_ref[cl], axis=1) + 1e-9
    err_on = (np.linalg.norm(acc_on[cl] - acc_ref[cl], axis=1) / scale).max()
    err_off = (np.linalg.norm(acc_off[cl] - acc_ref[cl], axis=1)
               / scale).max()
    # caps must hold FIRST: an overflow would make the accuracy failure
    # below a config problem, not a rescue bug
    assert int(np.asarray(stats.xport_need)) <= cfg.mesh_xrescue_export
    assert 0 < int(np.asarray(stats.ximport_need)) <= cfg.mesh_xrescue
    assert err_on < 5e-3, f"xrescue on: max rel err {err_on}"
    # without the exchange the cross-shard pair force is simply missing
    assert err_off > 5 * err_on, (err_off, err_on)


def test_device_reshard_matches_host(rng):
    """Device-side odd-even merge-split reshard (VERDICT r2 item 7) must
    produce the host path's exact global Hilbert order (codes compared, not
    rows: equal codes may tie-break differently) from a worst-case
    UNSORTED sharding, and be a pure permutation of the alive rows."""
    from tpu_nbody.config import SimConfig
    from tpu_nbody.ops import morton
    from tpu_nbody.parallel.sharded_pm import (make_device_reshard,
                                               reshard_by_hilbert)

    cap, n = 1024, 900
    cfg = SimConfig(capacity=cap, mesh_level=9)
    lrng = np.random.default_rng(5)
    pos = np.zeros((cap, 2), np.float32)
    pos[:n] = lrng.random((n, 2)) * [2400.0, 800.0]
    vel = np.zeros((cap, 2), np.float32)
    vel[:n] = lrng.standard_normal((n, 2)).astype(np.float32)
    mass = np.zeros(cap, np.float32)
    mass[:n] = lrng.random(n).astype(np.float32) + 0.5
    # interleave dead slots through the middle so dead-last routing is
    # exercised across shard boundaries, not just at the tail
    alive = np.arange(cap) < n
    perm = lrng.permutation(cap)
    state = from_arrays(pos[perm], vel[perm], mass[perm], capacity=cap)
    state = state._replace(alive=jnp.asarray(alive[perm]))

    m = mesh_lib.make_mesh()
    sstate = mesh_lib.shard_state(state, m)
    dev = jax.tree.map(np.asarray, make_device_reshard(m, cfg)(sstate))
    host = jax.tree.map(np.asarray, reshard_by_hilbert(state, m, cfg))

    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)

    def codes_of(st):
        return np.asarray(morton.hilbert_codes(
            jnp.asarray(st.pos), jnp.asarray(origin, jnp.float32),
            jnp.float32(2 * cfg.root_half), jnp.asarray(st.alive)))

    cd = codes_of(dev)
    assert (np.diff(cd) >= 0).all()          # globally sorted, dead last
    np.testing.assert_array_equal(cd, codes_of(host))
    np.testing.assert_array_equal(dev.alive, host.alive)
    assert int(dev.alive.sum()) == n

    def alive_rows(st):
        r = np.concatenate([st.pos, st.vel, st.mass[:, None]], axis=1)
        r = r[st.alive.astype(bool)]
        return r[np.lexsort(r.T)]

    np.testing.assert_array_equal(
        alive_rows(dev), alive_rows(jax.tree.map(np.asarray, state)))


def test_sharded_pm_full_features_match_single_device(rng):
    """Round-4 parity (VERDICT r3 item 4): the sharded P3M with the FULL
    single-chip feature set — rectangular mesh (mesh_ny), interlacing,
    kdk_reuse + persistent local sort — must match the single-chip solver
    per slot (the carried permutation restores slot identity)."""
    import dataclasses

    from tpu_nbody.config import SimConfig
    from tpu_nbody.engine import Engine
    from tpu_nbody.models import scenes
    from tpu_nbody.parallel.sharded_pm import (make_sharded_pm_step,
                                               reshard_by_hilbert)

    cap, n = 1024, 900
    # generous rescue caps (k=16/x16): at small k the shard-local +
    # cross-shard closest-first rankings legitimately drop different far
    # boxes than the single-chip global ranking (measured max 0.27 rel on
    # dense-core bodies at k=4, 1e-4 at k=16) — this test isolates the
    # round-4 FEATURES (rect mesh, interlace, persistent local sort), not
    # that documented approximation
    cfg = SimConfig(capacity=cap, mesh_level=9, mesh_ny=256, mesh_band=32,
                    mesh_chunk=128, mesh_rescue=16, mesh_xrescue=16,
                    mesh_xrescue_export=64, mesh_interlace=True,
                    pm_resort_every=2)
    p, v, mm = scenes.default_two_disk_scene(jax.random.PRNGKey(1),
                                             n1=700, n2=200)
    state = from_arrays(p, v, mm, capacity=cap)
    params = Params.default(dt=0.002, merge_min_dist=0.0)

    m = mesh_lib.make_mesh()
    sstate = reshard_by_hilbert(state, m, cfg)
    step = make_sharded_pm_step(m, cfg, integrator="kdk_reuse")
    out, stats = step(sstate, params, n_steps=4)
    assert int(np.asarray(stats.mesh_oob)) == 0

    # single-chip reference: the SAME config through the engine's
    # persistent-sorted pm path, from the same (resharded) ordering
    ref_eng = Engine(cfg, params, solver="pm", integrator="kdk_reuse")
    rs = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), sstate)
    ref_eng.state = rs
    ref_eng.step(4)

    np.testing.assert_allclose(np.asarray(out.pos),
                               np.asarray(ref_eng.state.pos),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.vel),
                               np.asarray(ref_eng.state.vel),
                               rtol=2e-2, atol=5e-2)

    # and the rect mesh must agree with the square mesh (window covers all
    # bodies): same sharded step at mesh_ny=0
    cfg_sq = dataclasses.replace(cfg, mesh_ny=0)
    out_sq, _ = make_sharded_pm_step(m, cfg_sq, integrator="kdk_reuse")(
        sstate, params, n_steps=4)
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(out_sq.pos),
                               rtol=1e-3, atol=5e-3)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(8)
