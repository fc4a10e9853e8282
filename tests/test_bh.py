"""Barnes-Hut solver accuracy: vs exact forces, vs the oracle BH, and the
conservative-MAC guarantee."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody import config as C
from tpu_nbody.models import scenes
from tpu_nbody.ops import forces, tree as tree_lib, traverse
from tests import oracle

MAX_DEPTH = 8


def _bh_accel(pos, mass, alive, theta, caps=None, traversal="dense"):
    cfg = C.SimConfig(capacity=pos.shape[0])
    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)
    t = tree_lib.build_tree(pos, mass, alive, origin, 2 * cfg.root_half,
                            num_nodes=cfg.num_nodes, leaf_size=8,
                            max_depth=MAX_DEPTH)
    caps = caps or {}
    return traverse.bh_accel_from_tree(
        t, jnp.float32(theta), jnp.float32(1.0), jnp.float32(80.0),
        group_size=64, group_cap=caps.get("group_cap", 512),
        max_depth=MAX_DEPTH, frontier_cap=caps.get("frontier_cap", 1024),
        approx_cap=caps.get("approx_cap", 2048),
        leaf_list_cap=caps.get("leaf_list_cap", 512),
        direct_body_cap=caps.get("direct_body_cap", 4096), group_chunk=16,
        traversal=traversal)


def _galaxy(n, cap):
    p, v, m = scenes.make_galaxy_disk(jax.random.PRNGKey(42), n, r=300.0)
    pos = jnp.zeros((cap, 2)).at[:n].set(p)
    mass = jnp.zeros((cap,)).at[:n].set(m)
    alive = jnp.arange(cap) < n
    return pos, mass, alive


@pytest.mark.parametrize("theta,tol", [(0.3, 3e-3), (0.5, 6e-3), (1.0, 3e-2)])
def test_bh_error_vs_exact(theta, tol):
    pos, mass, alive = _galaxy(1500, 1536)
    acc, stats = _bh_accel(pos, mass, alive, theta)
    assert not bool(stats.overflowed({
        "approx_cap": 2048, "leaf_list_cap": 512, "direct_body_cap": 4096,
        "frontier_cap": 1024, "group_cap": 512,
        "num_nodes": C.SimConfig(capacity=1536).num_nodes,
        "group_size": 64}))
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = ref * alive[:, None]
    rel = (np.linalg.norm(np.asarray(acc - ref), axis=-1)
           / (np.linalg.norm(np.asarray(ref), axis=-1) + 1e-9))[np.asarray(alive)]
    assert rel.mean() < tol, f"mean rel err {rel.mean()} at theta={theta}"


def test_bh_error_decreases_with_theta():
    pos, mass, alive = _galaxy(1000, 1024)
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = ref * alive[:, None]
    errs = []
    for theta in (0.3, 0.8, 1.5):
        acc, _ = _bh_accel(pos, mass, alive, theta)
        rel = (np.linalg.norm(np.asarray(acc - ref), axis=-1)
               / (np.linalg.norm(np.asarray(ref), axis=-1) + 1e-9))
        errs.append(rel[np.asarray(alive)].mean())
    assert errs[0] < errs[1] < errs[2]


def test_bh_no_worse_than_oracle_bh(rng):
    """Group MAC is conservative: error <= the reference's per-body MAC
    error (up to leaf-bucket monopole noise) on the same scene."""
    n, cap = 600, 640
    pos_np = (rng.random((n, 2)) * [2400, 800]).astype(np.float64)
    mass_np = (rng.random(n) + 0.5).astype(np.float64)
    pos = jnp.zeros((cap, 2)).at[:n].set(jnp.asarray(pos_np, jnp.float32))
    mass = jnp.zeros((cap,)).at[:n].set(jnp.asarray(mass_np, jnp.float32))
    alive = jnp.arange(cap) < n
    theta = 0.7

    exact = oracle.exact_accel(pos_np, mass_np, 80.0, 1.0)
    orc = oracle.bh_accel(pos_np, mass_np, theta, 80.0, 1.0, 2400.0, 800.0)
    got, _ = _bh_accel(pos, mass, alive, theta)
    got = np.asarray(got)[:n]

    scale = np.linalg.norm(exact, axis=-1) + 1e-9
    err_ours = (np.linalg.norm(got - exact, axis=-1) / scale).mean()
    err_oracle = (np.linalg.norm(orc - exact, axis=-1) / scale).mean()
    # conservative MAC should be at least as accurate (allow small slack for
    # f32 + leaf-bucket monopoles)
    assert err_ours <= err_oracle * 1.5 + 1e-4


def test_bh_matches_exact_at_tiny_theta():
    """theta -> 0 opens everything: BH == all-pairs to f32 precision."""
    pos, mass, alive = _galaxy(300, 512)
    acc, _ = _bh_accel(pos, mass, alive, 1e-3,
                       caps={"direct_body_cap": 512, "approx_cap": 4096,
                             "frontier_cap": 2048})
    ref = forces.accel_allpairs(pos, mass, 80.0, 1.0, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    got = np.asarray(acc)
    rel = (np.linalg.norm(got - ref, axis=-1)
           / (np.linalg.norm(ref, axis=-1) + 1e-9))[np.asarray(alive)]
    assert rel.max() < 1e-3


@pytest.mark.parametrize("theta", [0.3, 0.7])
def test_dense_traversal_equals_bfs(theta):
    """The dense monotone-MAC classification must reproduce the wave BFS
    exactly: same accept/direct sets (same pass criterion, and pass() is
    monotone down the tree so 'accepted' == pass(n) & !pass(parent)), same
    list order (both ascending node id), hence bit-identical forces AND
    identical need stats (except frontier_need, which only the BFS has)."""
    pos, mass, alive = _galaxy(1500, 1536)
    acc_d, st_d = _bh_accel(pos, mass, alive, theta, traversal="dense")
    acc_b, st_b = _bh_accel(pos, mass, alive, theta, traversal="bfs")
    np.testing.assert_array_equal(np.asarray(acc_d), np.asarray(acc_b))
    for f in ("approx_need", "leaf_need", "direct_need", "group_need",
              "node_need", "group_size_need"):
        assert int(getattr(st_d, f)) == int(getattr(st_b, f)), f


@pytest.mark.parametrize("theta", [0.3, 0.7])
def test_hier_traversal_equals_dense(theta):
    """The chunk-hierarchical traversal must produce the SAME interaction
    sets as the dense classification (same local monotone-MAC tests; the
    refinement only prunes nodes whose parent passes for the whole chunk
    box, which by box-monotonicity can never be accepted or taken direct
    by a member group). Forces differ only by f32 summation order — the
    hier path evaluates masked-dense pair blocks instead of compacted
    lists — so equality is checked to tight relative tolerance, and the
    shared need stats must agree exactly."""
    pos, mass, alive = _galaxy(1500, 1536)
    acc_d, st_d = _bh_accel(pos, mass, alive, theta, traversal="dense")
    acc_h, st_h = _bh_accel(pos, mass, alive, theta, traversal="hier")
    d = np.asarray(acc_d)
    h = np.asarray(acc_h)
    scale = np.abs(d).max()
    np.testing.assert_allclose(h, d, atol=2e-5 * scale)
    # direct bodies: hier counts per final chunk (a superset union of its
    # member groups' lists), so it must be >= the dense per-group max
    assert int(st_h.direct_need) >= int(st_d.direct_need)
    assert int(st_h.group_size_need) == int(st_d.group_size_need)
    assert st_h.cand_need is not None and int(st_h.cand_need.max()) > 0


def test_hier_cand_overflow_is_reported():
    """Undersized per-level candidate caps must flip overflowed() via
    cand_need so the engine retune loop can grow them."""
    pos, mass, alive = _galaxy(1500, 1536)
    cfg = C.SimConfig(capacity=1536)
    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)
    t = tree_lib.build_tree(pos, mass, alive, origin, 2 * cfg.root_half,
                            num_nodes=cfg.num_nodes, leaf_size=8,
                            max_depth=MAX_DEPTH)
    _, stats = traverse.bh_accel_from_tree(
        t, jnp.float32(0.3), jnp.float32(1.0), jnp.float32(80.0),
        group_size=64, group_cap=512, max_depth=MAX_DEPTH,
        frontier_cap=1024, approx_cap=2048, leaf_list_cap=512,
        direct_body_cap=4096, group_chunk=16, traversal="hier",
        hier_sizes=(64, 8), cand_caps=(16, 16))
    assert bool(stats.overflowed({
        "approx_cap": 2048, "leaf_list_cap": 512, "direct_body_cap": 4096,
        "frontier_cap": 1024, "group_cap": 512,
        "num_nodes": cfg.num_nodes, "group_size": 64,
        "cand_caps": (16, 16)}))
    assert not bool(stats.overflowed({
        "approx_cap": 2048, "leaf_list_cap": 512, "direct_body_cap": 4096,
        "frontier_cap": 1024, "group_cap": 512,
        "num_nodes": cfg.num_nodes, "group_size": 64,
        "cand_caps": (100000, 100000)}))


def test_overflow_is_reported():
    pos, mass, alive = _galaxy(1000, 1024)
    _, stats = _bh_accel(pos, mass, alive, 0.3,
                         caps={"direct_body_cap": 16})
    assert int(stats.direct_need) > 16
    assert bool(stats.overflowed({
        "approx_cap": 2048, "leaf_list_cap": 512, "direct_body_cap": 16,
        "frontier_cap": 1024, "group_cap": 512,
        "num_nodes": C.SimConfig(capacity=1024).num_nodes,
        "group_size": 64}))
