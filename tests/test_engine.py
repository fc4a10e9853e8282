"""End-to-end engine tests: stepping, scene API, checkpoint, diagnostics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody import checkpoint
from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine

SMALL = dict(max_depth=7, group_chunk=16, approx_cap=1024,
             direct_body_cap=2048, frontier_cap=512, leaf_list_cap=256)


@pytest.fixture(scope="module")
def engine():
    cfg = SimConfig(capacity=2048, **SMALL)
    eng = Engine(cfg, solver="bh", integrator="kdk")
    eng.reset_default_scene(n1=1200, n2=400)
    return eng


def test_step_and_energy(engine):
    e0 = engine.stats()
    engine.params = engine.params.replace(merge_min_dist=0.0)
    engine.step(5)
    e1 = engine.stats()
    assert int(e1["step"]) == int(e0["step"]) + 5
    # no merge -> body count constant, energy roughly conserved
    assert int(e1["n_alive"]) == int(e0["n_alive"])
    rel = abs(float(e1["energy"] - e0["energy"])) / abs(float(e0["energy"]))
    assert rel < 5e-3


def test_merge_eats_satellites(engine):
    engine.params = engine.params.replace(merge_min_dist=8.0)
    # Drop a black hole (m=50k > merge threshold 4k) straight onto the
    # dense disk center: nearby satellites must be absorbed within a step.
    com = np.asarray(engine.state.pos)[np.asarray(engine.state.alive)].mean(0)
    engine.add_black_hole(float(com[0]), float(com[1]))
    n0 = int(engine.state.n_alive())
    m0 = float(engine.state.mass.sum())
    engine.step(3)
    n1 = int(engine.state.n_alive())
    m1 = float(engine.state.mass.sum())
    assert n1 < n0  # heavy bodies absorb neighbors within 8px
    np.testing.assert_allclose(m1, m0, rtol=1e-4)  # mass conserved


def test_scene_edits(engine):
    n0 = int(engine.state.n_alive())
    engine.add_black_hole(600.0, 200.0, vx=10.0)
    assert int(engine.state.n_alive()) == n0 + 1
    engine.add_cloud(100, 0.5)
    assert int(engine.state.n_alive()) == n0 + 101
    engine.clear()
    assert int(engine.state.n_alive()) == 0
    engine.reset_default_scene(n1=500, n2=200)
    assert int(engine.state.n_alive()) == 700


def test_tree_boxes(engine):
    center, side = engine.tree_boxes()
    assert center.shape[0] == side.shape[0] > 0
    assert (side > 0).all()


def test_allpairs_engine_matches_bh_loosely():
    cfg = SimConfig(capacity=512, **SMALL)
    p = Params.default(merge_min_dist=0.0)
    e_bh = Engine(cfg, p, solver="bh", integrator="kdk", seed=9)
    e_ap = Engine(cfg, p, solver="allpairs", integrator="kdk",
                  allpairs_impl="xla", seed=9)
    e_bh.reset_default_scene(n1=300, n2=100)
    e_ap.state = e_bh.state
    e_bh.step(3)
    e_ap.step(3)
    d = np.linalg.norm(np.asarray(e_bh.state.pos - e_ap.state.pos), axis=-1)
    alive = np.asarray(e_bh.state.alive)
    assert np.median(d[alive]) < 0.5  # theta=0.3 trajectories stay close


def test_kdk_reuse_engine_runs():
    cfg = SimConfig(capacity=512, **SMALL)
    eng = Engine(cfg, solver="bh", integrator="kdk_reuse")
    eng.reset_default_scene(n1=300, n2=100)
    eng.step(4)
    assert int(eng.state.step) == 4


def test_step_stream_matches_step():
    """step_stream (n single-step executables, python-carried acc — the
    large-N BH mode that dodges the backend's scan fault) must produce the
    exact same trajectory as step's fused scan: same one_step graph, same
    carried acceleration, so bitwise-equal states."""
    cfg = SimConfig(capacity=512, **SMALL)
    a = Engine(cfg, solver="bh", integrator="kdk_reuse", seed=5)
    b = Engine(cfg, solver="bh", integrator="kdk_reuse", seed=5)
    a.reset_default_scene(n1=300, n2=100)
    b.reset_default_scene(n1=300, n2=100)
    a.step(4)
    b.step_stream(4)
    assert int(b.state.step) == 4
    # Bitwise equality holds today because both paths compile the identical
    # one_step graph; XLA is in principle free to fuse/round differently
    # across executables, so if this ever fails with tiny deltas it is a
    # compiler-rounding change, not a physics regression — relax to
    # assert_allclose(rtol=1e-6) in that case (ADVICE r4).
    np.testing.assert_array_equal(np.asarray(a.state.pos),
                                  np.asarray(b.state.pos))
    np.testing.assert_array_equal(np.asarray(a.state.vel),
                                  np.asarray(b.state.vel))
    np.testing.assert_array_equal(np.asarray(a.state.alive),
                                  np.asarray(b.state.alive))


def test_step_stream_split_matches_step():
    """bh_stream_split (4 small executables per step: build / traverse /
    kick+drift / kick+merge — the fallback for the tunnel compiler's
    fused-graph limit at N=1M) must follow step's fused scan trajectory;
    op order is identical so any deltas are cross-executable
    fusion/rounding differences."""
    cfg = SimConfig(capacity=512, **SMALL)
    a = Engine(cfg, solver="bh", integrator="kdk_reuse", seed=5)
    b = Engine(SimConfig(capacity=512, bh_stream_split=True, **SMALL),
               solver="bh", integrator="kdk_reuse", seed=5)
    a.reset_default_scene(n1=300, n2=100)
    b.reset_default_scene(n1=300, n2=100)
    a.step(4)
    b.step_stream(4)
    assert int(b.state.step) == 4
    np.testing.assert_allclose(np.asarray(a.state.pos),
                               np.asarray(b.state.pos), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.state.vel),
                               np.asarray(b.state.vel), rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.state.alive),
                                  np.asarray(b.state.alive))


def test_step_stream_pm():
    """step_stream must not crash on the pm persistent-sort step (it has no
    seed/carry split — round-4 regression: AttributeError on seed_fn); it
    falls through to step() and produces the same trajectory."""
    cfg = SimConfig(capacity=512, max_depth=7, mesh_level=6, mesh_band=32,
                    mesh_chunk=128, mesh_rescue=2)
    a = Engine(cfg, solver="pm", integrator="kdk_reuse", seed=5)
    b = Engine(cfg, solver="pm", integrator="kdk_reuse", seed=5)
    a.reset_default_scene(n1=300, n2=100)
    b.reset_default_scene(n1=300, n2=100)
    a.step(3)
    b.step_stream(3)
    assert int(b.state.step) == 3
    np.testing.assert_array_equal(np.asarray(a.state.pos),
                                  np.asarray(b.state.pos))


def test_cap_auto_retune():
    cfg = SimConfig(capacity=1024, max_depth=7, group_chunk=16,
                    approx_cap=64, direct_body_cap=64, frontier_cap=64,
                    leaf_list_cap=16)
    eng = Engine(cfg, solver="bh", integrator="kdk")
    eng.reset_default_scene(n1=600, n2=200)
    eng.step(1)
    caps = eng.caps
    assert (caps.approx_cap > 64 or caps.direct_body_cap > 64
            or caps.frontier_cap > 64 or caps.leaf_list_cap > 16)
    # after retune the recorded stats fit within the caps
    assert not bool(eng.last_stats.overflowed(caps.as_dict()))


def test_tighten_caps_shrinks_and_stays_correct():
    """Oversized caps shrink to ~1.5x measured need; results unchanged."""
    cfg = SimConfig(capacity=1024, max_depth=7, group_chunk=16,
                    approx_cap=4096, direct_body_cap=4096, frontier_cap=2048,
                    leaf_list_cap=1024)
    eng = Engine(cfg, solver="bh", integrator="kdk", seed=5)
    eng.reset_default_scene(n1=600, n2=200)
    eng.step(1)
    before = eng.caps
    pos_ref = np.asarray(eng.state.pos)
    assert eng.tighten_caps()
    after = eng.caps
    assert (after.approx_cap < before.approx_cap
            and after.direct_body_cap < before.direct_body_cap)
    # needs still fit under the tightened caps (1.5x headroom)
    assert not bool(eng.last_stats.overflowed(after.as_dict()))
    # replay the same step from the same state under tight caps: identical
    eng2 = Engine(cfg, solver="bh", integrator="kdk", seed=5)
    eng2.reset_default_scene(n1=600, n2=200)
    eng2.caps = after
    eng2._build_step()
    eng2.step(1)
    np.testing.assert_allclose(np.asarray(eng2.state.pos), pos_ref,
                               rtol=1e-6, atol=1e-4)


def test_checkpoint_roundtrip(tmp_path, engine):
    engine.reset_default_scene(n1=300, n2=100)
    engine.step(2)
    path = tmp_path / "ckpt.npz"
    checkpoint.save(path, engine.state, engine.params)
    state, params, _ = checkpoint.load(path)
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(engine.state.pos))
    np.testing.assert_array_equal(np.asarray(state.alive),
                                  np.asarray(engine.state.alive))
    assert int(state.step) == int(engine.state.step)
    assert float(params.G) == float(engine.params.G)
    # resume: stepping from the checkpoint matches stepping the original
    eng2 = Engine(engine.cfg, params, solver="bh", integrator="kdk")
    eng2.state = state
    eng2.step(2)
    engine.step(2)
    np.testing.assert_allclose(np.asarray(eng2.state.pos),
                               np.asarray(engine.state.pos), atol=1e-5)


def test_strict_parity_outside_root():
    """Outside-root bodies exert nothing in strict mode (BarnesHutAlg.kt:126)."""
    cfg = SimConfig(capacity=256, **SMALL)
    pos = np.zeros((3, 2), np.float32)
    pos[0] = [1200.0, 400.0]
    pos[1] = [1210.0, 400.0]
    pos[2] = [99999.0, 99999.0]  # far outside the root quad
    vel = np.zeros_like(pos)
    mass = np.array([10.0, 10.0, 1e9], np.float32)
    p = Params.default(dt=0.001, merge_min_dist=0.0)

    e_strict = Engine(cfg, p, solver="bh", integrator="kdk",
                      strict_parity=True)
    e_strict.set_bodies(pos, vel, mass)
    e_strict.step(1)
    # the 1e9-mass outsider must NOT have pulled bodies 0/1 (it exerts no
    # force in the reference because insert() drops it)
    v = np.asarray(e_strict.state.vel)[:2]
    assert np.abs(v).max() < 1.0

    e_phys = Engine(cfg, p, solver="bh", integrator="kdk",
                    strict_parity=False)
    e_phys.set_bodies(pos, vel, mass)
    e_phys.step(1)
    v2 = np.asarray(e_phys.state.vel)[:2]
    assert np.abs(v2).max() > np.abs(v).max()  # physical mode: it pulls


def _f32_nudge_signs(x, y):
    """The reference bit rule (BarnesHutAlg.kt:145-150) on f32 bit patterns:
    dx = +eps if low mantissa bit of x even else -eps; dy = -eps if even
    else +eps."""
    xb = int(np.float32(x).view(np.int32))
    yb = int(np.float32(y).view(np.int32))
    return (1.0 if (xb & 1) == 0 else -1.0,
            -1.0 if (yb & 1) == 0 else 1.0)


def test_strict_nudge_rule_and_masking():
    """strict_parity_nudge displaces exactly the coincident alive in-root
    bodies, by the reference's mantissa-bit +-1e-3 rule."""
    from tpu_nbody.ops.tree import strict_parity_nudge

    cfg = SimConfig(capacity=8, **SMALL)
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    # trigger cell side (first quad half < 1e-3)
    import math
    d = math.ceil(math.log2(cfg.root_half / 1e-3))
    s = side / (1 << d)

    base = np.float32(100.0)
    # place the pair safely inside one trigger cell: snap to a cell center
    cx = (np.floor((base - origin[0]) / s) + 0.5) * s + origin[0]
    cy = (np.floor((300.0 - origin[1]) / s) + 0.5) * s + origin[1]
    b0 = np.array([cx, cy], np.float32)
    b1 = np.nextafter(b0, np.float32(1e9), dtype=np.float32)  # 1 ulp off
    pos = np.zeros((8, 2), np.float32)
    pos[0], pos[1] = b0, b1
    pos[2] = [600.0, 200.0]        # isolated: untouched
    pos[3] = [600.0, 200.0]        # dead twin of 2: must not pair with it
    alive = np.array([1, 1, 1, 0, 0, 0, 0, 0], bool)
    # same trigger cell (precondition of the scenario)
    assert np.floor((pos[0] - origin) / s).tolist() \
        == np.floor((pos[1] - origin) / s).tolist()

    out = np.asarray(strict_parity_nudge(
        jnp.asarray(pos), jnp.asarray(alive), origin, side, rounds=1))
    for i in (0, 1):
        sx, sy = _f32_nudge_signs(pos[i, 0], pos[i, 1])
        # atol: one f32 ulp of the coordinate (the += rounds in f32)
        np.testing.assert_allclose(out[i] - pos[i],
                                   [sx * 1e-3, sy * 1e-3], atol=4e-5)
    np.testing.assert_array_equal(out[2:], pos[2:])  # spectators untouched


def test_oracle_nudge_separates_coincident():
    """The oracle's insert no longer recurses unboundedly on two bodies in
    the same sub-1e-3 cell (the reference's epsilon nudge separates them)."""
    from tests import oracle

    pos = np.array([[100.0, 300.0],
                    [np.nextafter(100.0, 200.0), 300.0],  # odd f64 bit
                    [600.0, 200.0]], np.float64)
    mass = np.array([10.0, 10.0, 10.0])
    root = oracle.build_oracle_tree(pos, mass, 2400.0, 800.0)
    # the pair got displaced: nudges have opposite x signs (even vs odd bit)
    assert abs(pos[0, 0] - pos[1, 0]) > 1e-3
    # NOTE a nudged body can leave its (sub-2e-3-wide) quad mid-insert, in
    # which case the reference's contains-check silently drops it from the
    # tree for that build — so root.mass may exclude a nudged body. The
    # spectator is always present.
    assert root.mass >= 10.0


def test_strict_parity_nudge_in_engine():
    """A strict-parity engine step applies the nudge as state mutation; the
    physical engine does not (G=0 isolates the nudge from dynamics)."""
    cfg = SimConfig(capacity=64, **SMALL)
    pos = np.zeros((3, 2), np.float32)
    pos[0] = [100.0, 300.0]
    pos[1] = np.nextafter(pos[0], np.float32(1e9), dtype=np.float32)
    pos[2] = [600.0, 200.0]
    vel = np.zeros_like(pos)
    mass = np.full((3,), 10.0, np.float32)
    p = Params.default(dt=0.001, merge_min_dist=0.0).replace(G=0.0)

    e = Engine(cfg, p, solver="bh", integrator="kdk", strict_parity=True)
    e.set_bodies(pos, vel, mass)
    e.step(1)
    out = np.asarray(e.state.pos)[:3]
    # pair displaced on the nudge scale, spectator exactly still (G=0)
    assert np.abs(out[0] - pos[0]).max() >= 9e-4
    assert np.abs(out[1] - pos[1]).max() >= 9e-4
    np.testing.assert_array_equal(out[2], pos[2])
    sx, sy = _f32_nudge_signs(pos[0, 0], pos[0, 1])
    np.testing.assert_allclose(out[0] - pos[0], [sx * 1e-3, sy * 1e-3],
                               rtol=1e-3, atol=2e-4)

    e2 = Engine(cfg, p, solver="bh", integrator="kdk", strict_parity=False)
    e2.set_bodies(pos, vel, mass)
    e2.step(1)
    np.testing.assert_array_equal(np.asarray(e2.state.pos)[:3], pos)


def test_twin_traversal_guard():
    """Regression guard for the two-traversal worker fault (PERFORMANCE.md):
    a 2-pass kdk + bh step graph at large capacity must be REFUSED up front
    (it kernel-faults the TPU worker mid-run at N=1M), kdk_reuse and the
    explicit override must build fine."""
    from tpu_nbody.engine import (TWIN_TRAVERSAL_MIN_CAP, Caps, make_step_fn)

    big = SimConfig(capacity=TWIN_TRAVERSAL_MIN_CAP, max_depth=10)
    caps = Caps.from_config(big)
    with pytest.raises(RuntimeError, match="traversal"):
        make_step_fn(big, caps, "bh", "kdk", False, 64)
    # single-instance graphs build (trace-free construction)
    make_step_fn(big, caps, "bh", "kdk_reuse", False, 64)
    import dataclasses
    allow = dataclasses.replace(big, bh_allow_twin_traversal=True)
    make_step_fn(allow, Caps.from_config(allow), "bh", "kdk", False, 64)
    # below the threshold kdk is allowed
    small = SimConfig(capacity=1024, max_depth=10)
    make_step_fn(small, Caps.from_config(small), "bh", "kdk", False, 64)
