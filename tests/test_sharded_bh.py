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
