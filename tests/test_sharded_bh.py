"""Multi-chip Barnes-Hut (LET exchange) tests on the 8-device virtual mesh."""

import jax
import numpy as np
import pytest

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Caps, Engine, make_bh_accel
from tpu_nbody.models import scenes
from tpu_nbody.ops.integrate import kdk_reuse_step
from tpu_nbody.parallel import mesh as mesh_lib
from tpu_nbody.parallel.engine import ShardedEngine
from tpu_nbody.parallel.sharded_bh import make_sharded_bh_step
from tpu_nbody.parallel.sharded_pm import reshard_by_hilbert
from tpu_nbody.state import from_arrays

# Caps must cover the scene's real needs: make_bh_accel here is called
# directly (no engine auto-retune), and an overflowing reference would
# silently drop interactions (asserted below).
SMALL = dict(max_depth=7, group_chunk=16, approx_cap=1024,
             direct_body_cap=2048, frontier_cap=512, leaf_list_cap=256,
             node_capacity=2048)


def test_sharded_bh_matches_single_device():
    """Domain-decomposed BH + LET export vs single-chip BH, two-disk scene.

    The LET criterion is evaluated against whole-domain boxes, which is
    strictly more conservative than the single-chip per-group boxes, so the
    two solvers make different (both MAC-valid) approximation choices; the
    comparison tolerance covers the resulting theta-scale force differences
    integrated over a few steps.
    """
    cap, n1, n2 = 2048, 1200, 400
    cfg = SimConfig(capacity=cap, **SMALL)
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(1),
                                            n1=n1, n2=n2)
    state = from_arrays(p, v, m, capacity=cap)
    params = Params.default(dt=0.002, merge_min_dist=0.0)

    mesh = mesh_lib.make_mesh()
    sstate = reshard_by_hilbert(state, mesh, cfg)
    caps = Caps.from_config(cfg)
    step = make_sharded_bh_step(mesh, cfg, caps, let_approx_cap=1024,
                                let_body_cap=1024, let_leaf_cap=256,
                                let_frontier_cap=2048)
    out, stats = step(sstate, params, n_steps=3)
    assert int(np.asarray(stats.export_need)) <= 1024 + 1024
    assert int(np.asarray(stats.let_leaf_need)) <= 256
    assert int(np.asarray(stats.let_frontier_need)) <= 2048
    assert not bool(np.asarray(stats.trav.overflowed(caps.as_dict())))

    # single-chip kdk_reuse BH on the SAME (resharded) ordering
    ref = jax.device_put(jax.tree.map(np.asarray, sstate))
    accel_stats = make_bh_accel(cfg, caps)

    def accel(pos, mass, alive, prm):
        a, st = accel_stats(pos, mass, alive, prm)
        assert not bool(np.asarray(st.overflowed(caps.as_dict())))
        return a

    acc = accel(ref.pos, ref.mass, ref.alive, params)
    for _ in range(3):
        ref, acc = kdk_reuse_step(ref, acc, params, accel)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                               rtol=1e-2, atol=5e-2)


def test_let_body_export_carries_boundary_clump_force():
    """Adversarial LET case (VERDICT r3 item 10): a dense clump whose
    bodies the Hilbert cut splits across DIFFERENT shards. Its internal
    forces are order-one and near-field — the MAC opens boundary-adjacent
    cells all the way down (box gap 0), so they must flow through the LET
    *body* export path (opened leaves), not the approx path. A broken body
    export shows up as order-one force errors on exactly these bodies."""
    import jax.numpy as jnp

    from tpu_nbody.ops import morton

    rng = np.random.default_rng(42)
    cap = 1024
    cfg = SimConfig(capacity=cap, **SMALL)

    # uniform background fills every shard with curve mass; the clump is
    # placed AT the background body whose Hilbert rank sits just under the
    # 2nd shard-boundary slot (cap/8 per shard), so the contiguous clump
    # codes straddle that boundary after the reshard
    nbg, nc = 900, 40
    pos = np.zeros((cap, 2), np.float32)
    pos[:nbg] = rng.random((nbg, 2)) * [2400, 800]
    mass = np.zeros(cap, np.float32)
    mass[:nbg] = 1.0
    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)
    codes = np.asarray(morton.hilbert_codes(
        jnp.asarray(pos[:nbg]), jnp.asarray(origin, jnp.float32),
        jnp.float32(2 * cfg.root_half), jnp.ones(nbg, bool)))
    anchor = pos[:nbg][np.argsort(codes)][2 * (cap // 8) - nc // 2]
    pos[nbg:nbg + nc] = anchor
    pos[nbg:nbg + nc] += rng.random((nc, 2)).astype(np.float32) * 2.0
    mass[nbg:nbg + nc] = 50.0
    n = nbg + nc
    state = from_arrays(pos, np.zeros_like(pos), mass, capacity=cap)
    state = state._replace(alive=jnp.asarray(np.arange(cap) < n))
    params = Params.default(dt=1e-4, merge_min_dist=0.0)

    mesh = mesh_lib.make_mesh()
    sstate = reshard_by_hilbert(state, mesh, cfg)
    # precondition: the clump really is split across >= 2 shards
    cl = np.asarray(sstate.mass) == 50.0
    shard_of = np.arange(cap) // (cap // 8)
    assert len(set(shard_of[cl])) >= 2, "clump not split by the decomposition"

    caps = Caps.from_config(cfg)
    step = make_sharded_bh_step(mesh, cfg, caps, let_approx_cap=1024,
                                let_body_cap=1024, let_leaf_cap=256,
                                let_frontier_cap=2048)
    out, stats = step(sstate, params, n_steps=1)
    assert int(np.asarray(stats.export_need)) <= 2048
    assert int(np.asarray(stats.let_leaf_need)) > 0  # bodies WERE exported
    # kdk_reuse: vel += a(t)*dt/2 + a(t+dt)*dt/2; at dt=1e-4 the two halves
    # are ~equal, so the velocity delta over one step reads back a(t)
    acc_sh = (np.asarray(out.vel) - np.asarray(sstate.vel)) \
        / float(params.dt)

    accel_stats = make_bh_accel(cfg, caps)
    acc_ref, st = accel_stats(sstate.pos, sstate.mass, sstate.alive, params)
    assert not bool(np.asarray(st.overflowed(caps.as_dict())))
    acc_ref = np.asarray(acc_ref)

    scale = np.linalg.norm(acc_ref[cl], axis=1) + 1e-9
    err = (np.linalg.norm(acc_sh[cl] - acc_ref[cl], axis=1) / scale).max()
    # clump-internal forces are exact bodies on both sides; only theta-scale
    # far-field choices differ
    assert err < 5e-2, f"boundary clump force err {err}"

    # and the clump force is ORDER-ONE from cross-shard neighbors: zeroing
    # the import (theta -> tiny exports nothing... instead check magnitude)
    assert float(np.median(scale)) > 10.0  # the clump actually self-binds


def test_sharded_engine_bh_multi_reshard_merging_matches_single():
    """ShardedEngine BH across >= 2 device reshards WITH MERGING ON,
    equality-checked vs the single-device BH engine (VERDICT r3 item 10).
    Bodies reorder across reshards, so compare as multisets."""
    cfg = SimConfig(capacity=1024, **SMALL)
    params = Params.default(dt=0.002)        # merge on (min_dist 8)

    ref = Engine(cfg, params, solver="bh", integrator="kdk_reuse")
    ref.reset_default_scene(n1=600, n2=200)
    ref.step(5)

    eng = ShardedEngine(cfg, params, mesh=mesh_lib.make_mesh(),
                        solver="bh", integrator="kdk_reuse",
                        reshard_every=2, let_approx_cap=1024,
                        let_body_cap=1024, let_leaf_cap=256)
    eng.reset_default_scene(n1=600, n2=200)
    eng.step(5)                               # crosses 2 reshard boundaries

    assert int(eng.state.n_alive()) == int(ref.state.n_alive())

    def alive_rows(st):
        al = np.asarray(st.alive)
        r = np.concatenate([np.asarray(st.pos)[al],
                            np.asarray(st.mass)[al][:, None]], axis=1)
        return r[np.lexsort(r.T)]

    a, b = alive_rows(ref.state), alive_rows(eng.state)
    # same bodies merged, same trajectories up to LET-vs-group MAC choices
    np.testing.assert_allclose(b[:, 2], a[:, 2], rtol=1e-5)   # masses
    np.testing.assert_allclose(b[:, :2], a[:, :2], rtol=1e-3, atol=2e-2)


def test_sharded_engine_bh_end_to_end():
    """ShardedEngine(solver="bh") across a reshard boundary with merging."""
    cfg = SimConfig(capacity=1024, **SMALL)
    eng = ShardedEngine(cfg, Params.default(), mesh=mesh_lib.make_mesh(),
                        solver="bh", reshard_every=3,
                        let_approx_cap=512, let_body_cap=512,
                        let_leaf_cap=128)
    eng.reset_default_scene(n1=600, n2=200)
    n0 = int(eng.state.n_alive())
    m0 = float(np.asarray(eng.state.mass).sum())
    eng.step(7)   # crosses two reshard boundaries
    assert int(eng.state.step) == 7
    assert np.isfinite(np.asarray(eng.state.pos)).all()
    n1_ = int(eng.state.n_alive())
    m1 = float(np.asarray(eng.state.mass).sum())
    assert n1_ <= n0                      # central 50k mass absorbs
    np.testing.assert_allclose(m1, m0, rtol=1e-4)  # mass conserved
