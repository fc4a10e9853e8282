"""P3M mesh solver tests: split exactness, accuracy vs all-pairs, engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody import config as C
from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine
from tpu_nbody.models import scenes
from tpu_nbody.ops import forces, mesh


def _origin_side(cfg):
    return ((cfg.root_center[0] - cfg.root_half,
             cfg.root_center[1] - cfg.root_half), 2 * cfg.root_half)


def test_band_matches_brute_force_with_full_coverage(rng):
    n = 96
    pos = jnp.asarray(rng.random((n, 2)) * 30, jnp.float32)
    mass = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
    soft2, a = 1.0, 6.0
    acc_ref = np.zeros((n, 2))
    pn, mn = np.asarray(pos, np.float64), np.asarray(mass, np.float64)
    for i in range(n):
        d = pn - pn[i]
        r2 = (d * d).sum(1)
        w = mn / np.sqrt(r2 + soft2) / (r2 + soft2) * np.exp(
            -np.clip((r2 / (a * a)) ** 2, 0, 700))
        w[i] = 0
        acc_ref[i] = (w[:, None] * d).sum(0)
    out = jax.jit(lambda p, m: mesh._band_short_range(
        p, m, jnp.float32(soft2), jnp.float32(a), band=n, chunk=n))(pos, mass)
    np.testing.assert_allclose(np.asarray(out), acc_ref, atol=2e-5, rtol=1e-4)


def test_two_body_far_field():
    """Mesh reproduces the exact softened force for a well-separated pair."""
    cap = 8
    pos = jnp.zeros((cap, 2)).at[0].set(jnp.asarray([500.0, 400.0])) \
        .at[1].set(jnp.asarray([1500.0, 400.0]))
    mass = jnp.zeros((cap,)).at[0].set(100.0).at[1].set(200.0)
    alive = jnp.arange(cap) < 2
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    G, soft2, d = 80.0, 1.0, 1000.0
    acc = mesh.pm_accel(pos, mass, alive, G, soft2, origin, side,
                        mesh_level=9, split_cells=2.5, band=4, chunk=8)
    # atol covers the transverse leakage of the least-squares potential
    # kernel (mesh._kernel_hats): the FD-gradient projection is anisotropic
    # at the ~1e-3-of-force level for this deliberately coarse level-9 /
    # split-2.5 config (it shrinks with split^2; the bench config uses 4+).
    np.testing.assert_allclose(np.asarray(acc)[0], [G * 200 / (d * d + 1), 0],
                               rtol=2e-3, atol=2.5e-5)
    np.testing.assert_allclose(np.asarray(acc)[1], [-G * 100 / (d * d + 1), 0],
                               rtol=2e-3, atol=2.5e-5)
    # dead slots get zero
    assert (np.asarray(acc)[2:] == 0).all()


def test_accuracy_vs_allpairs_galaxy():
    n, cap = 2000, 2048
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(42), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    acc = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin, side,
                                   mesh_level=10, split_cells=2.5, band=128,
                                   chunk=2048))
    rel = (np.linalg.norm(acc - ref, axis=-1)
           / (np.linalg.norm(ref, axis=-1) + 1e-9))[np.asarray(alive)]
    assert rel.mean() < 2e-2, rel.mean()
    assert np.percentile(rel, 99) < 1e-1


def test_tsc_order3_accuracy_and_self_force():
    """TSC (order-3) assignment: at least CIC accuracy on the galaxy scene
    with the matching sinc^-6 deconvolution, exact zero self-force
    (symmetric deposit/interp with the odd kernel), and far-pair parity."""
    n, cap = 2000, 2048
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(42), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    errs = {}
    for order in (2, 3):
        acc = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin,
                                       side, mesh_level=10, split_cells=3.0,
                                       band=128, chunk=2048, rescue_k=8,
                                       order=order))
        rel = (np.linalg.norm(acc - ref, axis=-1)
               / (np.linalg.norm(ref, axis=-1) + 1e-9))[np.asarray(alive)]
        errs[order] = rel.mean()
    assert errs[3] < 1.5 * errs[2], errs  # TSC holds (or beats) CIC accuracy

    # single body: mesh force on it must be ~zero (self-force cancellation)
    pos1 = jnp.zeros((8, 2)).at[0].set(jnp.asarray([497.3, 403.9]))
    mass1 = jnp.zeros((8,)).at[0].set(1000.0)
    alive1 = jnp.arange(8) < 1
    acc1 = np.asarray(mesh.pm_accel(pos1, mass1, alive1, 80.0, 1.0, origin,
                                    side, mesh_level=9, split_cells=3.0,
                                    band=4, chunk=8, order=3))
    assert np.abs(acc1[0]).max() < 1e-4, acc1[0]


def test_accuracy_improves_with_mesh_level():
    n, cap = 1500, 1536
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(7), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    errs = []
    for lvl in (8, 10):
        acc = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin,
                                       side, mesh_level=lvl, split_cells=2.5,
                                       band=128, chunk=1536))
        rel = (np.linalg.norm(acc - ref, axis=-1)
               / (np.linalg.norm(ref, axis=-1) + 1e-9))[np.asarray(alive)]
        errs.append(rel.mean())
    assert errs[1] < errs[0]


def test_rescue_band_no_double_counting():
    """With a band already covering every pair, the rescue pass adds ~zero.

    The rescue pass must sum ONLY pairs whose first-pass blocks are more
    than one apart; when band == cap there is a single first-pass block, so
    every pair is covered and the rescue contribution must vanish.
    """
    n, cap = 300, 512
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(5), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    kw = dict(mesh_level=9, split_cells=2.5, chunk=512)
    a0 = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin, side,
                                  band=cap, rescue_k=0, **kw))
    a1 = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin, side,
                                  band=cap, rescue_k=4, **kw))
    # Double counting would add O(|a|) errors; tolerance here only needs to
    # absorb f32 fusion noise (fma/reassociation differs between graphs).
    np.testing.assert_allclose(a1, a0, rtol=1e-4, atol=1e-3)


def test_rescue_band_catches_curve_boundary_pair():
    """A close pair straddling the world-center Hilbert discontinuity.

    Many filler bodies sit between the two on the curve, so a small band
    misses their (dominant) short-range force; the block-bbox rescue pass
    (mesh._block_rescue) must recover it. Without rescue the error on the
    pair is order-one.
    """
    cap = 4096
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    cx, cy = cfg.root_center
    key = jax.random.PRNGKey(11)
    filler = jax.random.uniform(key, (cap - 2, 2), jnp.float32,
                                cx - 900.0, cx + 900.0)
    # the pair: 4 units apart, straddling the vertical center line
    pos = jnp.concatenate([jnp.asarray([[cx - 2.0, cy + 300.0],
                                        [cx + 2.0, cy + 300.0]],
                                       jnp.float32), filler])
    mass = jnp.full((cap,), 1.0, jnp.float32)
    alive = jnp.ones((cap,), bool)
    ref = np.asarray(forces.accel_allpairs(pos, mass, 80.0, 1.0,
                                           implementation="xla"))
    kw = dict(mesh_level=10, split_cells=3.0, band=32, chunk=4096)
    a_no = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin,
                                    side, rescue_k=0, **kw))
    a_yes, st = mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin,
                              side, rescue_k=8, return_stats=True, **kw)
    a_yes = np.asarray(a_yes)
    assert int(st["rescue_need"]) <= 8   # coverage was exact
    scale = np.linalg.norm(ref[0])
    err_no = np.linalg.norm(a_no[:2] - ref[:2], axis=1).max() / scale
    err_yes = np.linalg.norm(a_yes[:2] - ref[:2], axis=1).max() / scale
    assert err_no > 0.2, err_no          # without rescue: pair force lost
    assert err_yes < 0.05, err_yes       # with rescue: recovered
    assert err_yes < err_no / 10


def test_engine_pm_runs_and_conserves():
    cfg = SimConfig(capacity=2048, mesh_level=10, mesh_band=64,
                    mesh_chunk=2048)
    eng = Engine(cfg, Params.default(merge_min_dist=0.0), solver="pm",
                 integrator="kdk")
    eng.reset_default_scene(n1=1000, n2=500)
    s0 = eng.stats()
    eng.step(5)
    s1 = eng.stats()
    assert int(s1["n_alive"]) == 1500
    rel = abs(float(s1["energy"] - s0["energy"])) / abs(float(s0["energy"]))
    assert rel < 2e-2


@pytest.mark.parametrize("resort_every", [1, 4])
def test_pm_persistent_sort_matches_unsorted(resort_every):
    """kdk_reuse + pm_persistent_sort must match the per-pass-sorted path.

    The persistent path evaluates each force pass in the order computed at
    the PREVIOUS position (resort happens at the end of a step), so the
    band windows see a one-step-stale order even at resort_every=1 — the
    divergence is bounded by the solver's own short-range coverage accuracy
    (~3e-4 at bench settings), not float noise. Merge results and external
    slot identity must match exactly.
    """
    mk = dict(capacity=2048, mesh_level=10, mesh_band=64, mesh_chunk=2048,
              mesh_rescue=4)
    cfg_ref = SimConfig(pm_persistent_sort=False, **mk)
    cfg_new = SimConfig(pm_persistent_sort=True,
                        pm_resort_every=resort_every, **mk)
    params = Params.default(merge_min_dist=8.0)

    out = []
    for cfg in (cfg_ref, cfg_new):
        eng = Engine(cfg, params, solver="pm", integrator="kdk_reuse",
                     seed=7)
        eng.reset_default_scene(n1=1000, n2=500)
        eng.add_black_hole(*np.asarray(eng.state.pos)[0])  # exercise merge
        eng.step(6)
        out.append(eng)
    ref, new = out
    # External slot identity restored: alive masks line up slot-for-slot.
    np.testing.assert_array_equal(np.asarray(ref.state.alive),
                                  np.asarray(new.state.alive))
    a = np.asarray(ref.state.pos)[np.asarray(ref.state.alive)]
    b = np.asarray(new.state.pos)[np.asarray(new.state.alive)]
    scale = np.abs(a).max()
    tol = 1e-3 if resort_every == 1 else 5e-3
    assert np.abs(a - b).max() / scale < tol
    np.testing.assert_allclose(float(ref.state.mass.sum()),
                               float(new.state.mass.sum()), rtol=1e-5)


def test_pm_rescue_need_surfaced():
    cfg = SimConfig(capacity=1024, mesh_level=9, mesh_band=32,
                    mesh_chunk=1024, mesh_rescue=4, pm_persistent_sort=False)
    eng = Engine(cfg, Params.default(merge_min_dist=0.0), solver="pm",
                 integrator="kdk")
    eng.reset_default_scene(n1=600, n2=200)
    eng.step(1)
    assert eng.last_rescue_need >= 0  # plumbed through (int, not None)


def test_deposit_run_compress_matches_plain(rng):
    """Run-compressed deposit (segmented run sums + conflict-free scatter)
    must equal the plain per-body scatter up to per-cell summation order —
    clustered Hilbert-sorted bodies AND an adversarial unsorted order
    (runs degenerate to length 1)."""
    nw, grid = 64, 128
    n = 4000
    lrng = np.random.default_rng(11)
    # half clustered into few cells, half spread out
    pos = np.concatenate([
        lrng.random((n // 2, 2)).astype(np.float32) * 3.0 + 20.0,
        lrng.random((n // 2, 2)).astype(np.float32) * 60.0])
    mass = lrng.random(n).astype(np.float32) + 0.5
    codes = np.asarray(mesh.morton.hilbert_codes(
        jnp.asarray(pos), jnp.zeros((2,), jnp.float32), jnp.float32(64.0),
        jnp.ones((n,), bool)))
    for order in (np.argsort(codes), np.arange(n)):  # sorted + unsorted
        p, m = jnp.asarray(pos[order]), jnp.asarray(mass[order])
        base, w = mesh._cic_cells(p, jnp.zeros((2,), jnp.float32),
                                  jnp.float32(1.0), nw, 2)
        rho_p = mesh._deposit_packed(m, base, w, nw, grid, run_compress=False)
        for mode in (True, 4, 8):  # full-run scan + window-4/8 dense
            rho_c = mesh._deposit_packed(m, base, w, nw, grid,
                                         run_compress=mode)
            np.testing.assert_allclose(np.asarray(rho_c), np.asarray(rho_p),
                                       rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(float(rho_c.sum()), float(m.sum()),
                                       rtol=1e-6)  # no mass lost to the dump


def test_two_tier_rescue_matches_single_tier():
    """Two-tier rescue (base k + hot blocks at k_hot) must equal single-tier
    k=k_hot exactly when hot_cap covers every hot block: the tiers partition
    the same closest-first top-k_hot ranking."""
    lrng = np.random.default_rng(21)
    cap, n = 2048, 1900
    # clustered scene around the world-center cross: plenty of blocks that
    # need more than the base k partners
    pos = np.zeros((cap, 2), np.float32)
    pos[:n // 2] = lrng.random((n // 2, 2)).astype(np.float32) * [2400, 800]
    pos[n // 2:n] = (1200.0 + lrng.standard_normal((n - n // 2, 2)) * 12.0)
    mass = np.zeros(cap, np.float32)
    mass[:n] = 1.0
    alive = jnp.asarray(np.arange(cap) < n)
    spos, smass, salive, _ = mesh._hilbert_sort(
        jnp.asarray(pos), jnp.asarray(mass), alive,
        jnp.zeros((2,), jnp.float32), jnp.float32(2404.0))
    a = jnp.float32(4.0 * 2404.0 / 512.0)
    kw = dict(band=32, chunk=256)
    acc1, need1, hot1 = mesh._block_rescue(
        spos, smass, salive, 1.0, a, k=12, **kw)
    acc2, need2, hot2 = mesh._block_rescue(
        spos, smass, salive, 1.0, a, k=4, k_hot=12, hot_cap=64, **kw)
    assert int(hot2) > 0 and int(hot2) <= 64  # the case exercises the tier
    np.testing.assert_array_equal(np.asarray(need1), np.asarray(need2))
    np.testing.assert_allclose(np.asarray(acc2), np.asarray(acc1),
                               rtol=1e-5, atol=1e-6)


def test_rect_mesh_matches_square():
    """Rectangular mesh (mesh_ny = nx/2, vertically centered) must agree
    with the square mesh to mesh-truncation order on a scene inside the
    window, report zero OOB there, and count OOB bodies when the scene
    leaks out."""
    lrng = np.random.default_rng(31)
    cap, n = 2048, 1800
    cfg = SimConfig(capacity=cap)
    cx, cy = cfg.root_center
    origin = (cx - cfg.root_half, cy - cfg.root_half)
    side = 2.0 * cfg.root_half
    pos = np.zeros((cap, 2), np.float32)
    pos[:n, 0] = lrng.random(n) * 2300.0 + 50.0
    pos[:n, 1] = lrng.random(n) * 700.0 + 50.0      # well inside ny window
    mass = np.zeros(cap, np.float32)
    mass[:n] = lrng.random(n).astype(np.float32) + 0.5
    alive = jnp.asarray(np.arange(cap) < n)
    kw = dict(mesh_level=9, split_cells=4.0, band=64, chunk=2048)

    a_sq = mesh.pm_accel(jnp.asarray(pos), jnp.asarray(mass), alive, 80.0,
                         1.0, origin, side, **kw)
    a_rc, st = mesh.pm_accel(jnp.asarray(pos), jnp.asarray(mass), alive,
                             80.0, 1.0, origin, side, mesh_ny=256,
                             return_stats=True, **kw)
    assert int(st["mesh_oob"]) == 0
    sq = np.asarray(a_sq)[:n]
    rc = np.asarray(a_rc)[:n]
    scale = np.linalg.norm(sq, axis=1).mean()
    # both are O(h/a)^2 approximations of the same smooth field sampled on
    # shifted grids; they agree to a fraction of the typical force
    assert np.abs(rc - sq).max() / scale < 0.05
    assert np.abs(rc - sq).mean() / scale < 2e-3

    # leak the scene out of the y window: the stat must count it
    pos2 = pos.copy()
    pos2[:50, 1] = cy + 300.0 * 256 / 512 + 700.0   # far above the window
    _, st2 = mesh.pm_accel(jnp.asarray(pos2), jnp.asarray(mass), alive,
                           80.0, 1.0, origin, side, mesh_ny=256,
                           return_stats=True, **kw)
    assert int(st2["mesh_oob"]) >= 50

def test_poly4_switch_matches_exp4_accuracy():
    """mesh_switch="poly4" (compact polynomial split) must match the exp4
    split's accuracy: both sides of the split consult the SAME switch (the
    spectral kernel samples 1-w), so the choice only moves work between
    F_short and F_long, not the total (ops/mesh.py _short_weight)."""
    n, cap = 2000, 2048
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(42), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    cfg = SimConfig(capacity=cap)
    origin, side = _origin_side(cfg)
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    rels = {}
    for sw in ("exp4", "poly4"):
        acc = np.asarray(mesh.pm_accel(pos, mass, alive, 80.0, 1.0, origin,
                                       side, mesh_level=10, split_cells=2.5,
                                       band=128, chunk=2048, rescue_k=4,
                                       switch=sw))
        rel = (np.linalg.norm(acc - ref, axis=-1)
               / (np.linalg.norm(ref, axis=-1) + 1e-9))[np.asarray(alive)]
        rels[sw] = rel.mean()
    assert rels["poly4"] < 2.0 * rels["exp4"], rels
    assert rels["poly4"] < 2e-2, rels
