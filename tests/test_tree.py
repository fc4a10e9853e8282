"""Flat quadtree invariants + Hilbert/Morton code tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody import config as C
from tpu_nbody.ops import morton, tree as tree_lib

MAX_DEPTH = 8


def _build(pos, mass, alive, cap_nodes=4096, leaf=8):
    cfg = C.SimConfig(capacity=pos.shape[0])
    origin = (cfg.root_center[0] - cfg.root_half,
              cfg.root_center[1] - cfg.root_half)
    return tree_lib.build_tree(pos, mass, alive, origin, 2 * cfg.root_half,
                               num_nodes=cap_nodes, leaf_size=leaf,
                               max_depth=MAX_DEPTH)


def test_morton_roundtrip(rng):
    ix = rng.integers(0, 1 << 15, 1000)
    iy = rng.integers(0, 1 << 15, 1000)
    code = morton.encode2d(jnp.asarray(ix), jnp.asarray(iy))
    x2, y2 = morton.decode2d(code)
    assert (np.asarray(x2) == ix).all() and (np.asarray(y2) == iy).all()


def test_hilbert_roundtrip_and_locality(rng):
    ix = rng.integers(0, 1 << 15, 1000)
    iy = rng.integers(0, 1 << 15, 1000)
    d = morton.hilbert2d(jnp.asarray(ix), jnp.asarray(iy))
    x2, y2 = morton.hilbert2d_inverse(d)
    assert (np.asarray(x2) == ix).all() and (np.asarray(y2) == iy).all()
    # continuity at a coarse level: consecutive codes are grid neighbors
    lvl = 6
    codes = jnp.arange(4 ** lvl) << (2 * (morton.COORD_BITS - lvl))
    x, y = morton.hilbert2d_inverse(codes)
    xs, ys = np.asarray(x) >> (morton.COORD_BITS - lvl), np.asarray(y) >> (morton.COORD_BITS - lvl)
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


def test_hilbert_prefix_is_quadtree_cell():
    """Every aligned code range of size 4^(15-l) is an axis-aligned cell."""
    lvl = 4
    span = 1 << (2 * (morton.COORD_BITS - lvl))
    rng = np.random.default_rng(0)
    for lo in rng.integers(0, 4 ** lvl, 20) * span:
        codes = jnp.asarray(lo + np.arange(0, span, span // 64))
        x, y = morton.hilbert2d_inverse(codes)
        cx = np.asarray(x) >> (morton.COORD_BITS - lvl)
        cy = np.asarray(y) >> (morton.COORD_BITS - lvl)
        assert len(np.unique(cx)) == 1 and len(np.unique(cy)) == 1


def _random_scene(rng, n, cap):
    pos = np.zeros((cap, 2), np.float32)
    pos[:n] = rng.random((n, 2)) * [2400, 800]
    mass = np.zeros(cap, np.float32)
    mass[:n] = rng.random(n) + 0.5
    alive = np.arange(cap) < n
    return jnp.asarray(pos), jnp.asarray(mass), jnp.asarray(alive)


def test_tree_mass_and_com(rng):
    pos, mass, alive = _random_scene(rng, 900, 1024)
    t = _build(pos, mass, alive)
    np.testing.assert_allclose(float(t.mass[0]), float(mass.sum()), rtol=1e-5)
    want_com = np.asarray((mass[:, None] * pos).sum(0) / mass.sum())
    np.testing.assert_allclose(np.asarray(t.com[0]), want_com, rtol=1e-4)
    assert int(t.n_alive) == 900


def test_tree_children_partition_parent(rng):
    pos, mass, alive = _random_scene(rng, 900, 1024)
    t = _build(pos, mass, alive)
    n = int(t.n_nodes)
    child = np.asarray(t.child)[:n]
    nc = np.asarray(t.n_children)[:n]
    count = np.asarray(t.count)[:n]
    start = np.asarray(t.start)[:n]
    mass_n = np.asarray(t.mass)[:n]
    for i in range(n):
        if child[i] >= 0:
            c, k = child[i], nc[i]
            assert 1 <= k <= 4
            assert count[c:c + k].sum() == count[i]
            assert (count[c:c + k] > 0).all()  # only occupied children exist
            assert start[c] == start[i]
            # children are contiguous ranges in order
            for j in range(k - 1):
                assert start[c + j] + count[c + j] == start[c + j + 1]
            np.testing.assert_allclose(mass_n[c:c + k].sum(), mass_n[i],
                                       rtol=1e-4)
        else:
            assert nc[i] == 0


def test_tree_leaves_partition_bodies(rng):
    pos, mass, alive = _random_scene(rng, 500, 512)
    t = _build(pos, mass, alive, leaf=4)
    n = int(t.n_nodes)
    child = np.asarray(t.child)[:n]
    count = np.asarray(t.count)[:n]
    start = np.asarray(t.start)[:n]
    leaves = [(start[i], count[i]) for i in range(n)
              if child[i] < 0 and count[i] > 0]
    leaves.sort()
    covered = 0
    for s, c in leaves:
        assert s == covered
        covered += c
    assert covered == 500


def test_leaf_cells_contain_their_bodies(rng):
    pos, mass, alive = _random_scene(rng, 500, 512)
    t = _build(pos, mass, alive, leaf=4)
    n = int(t.n_nodes)
    ids = jnp.arange(t.code.shape[0], dtype=jnp.int32)
    center, side = t.cell_geometry(ids)
    center, side = np.asarray(center), np.asarray(side)
    child = np.asarray(t.child)[:n]
    count = np.asarray(t.count)[:n]
    start = np.asarray(t.start)[:n]
    spos = np.asarray(t.spos)
    for i in range(n):
        if child[i] < 0 and count[i] > 0:
            b = spos[start[i]:start[i] + count[i]]
            lo = center[i] - side[i] / 2 - 1e-3
            hi = center[i] + side[i] / 2 + 1e-3
            assert (b >= lo).all() and (b <= hi).all()


def test_dead_bodies_excluded(rng):
    pos, mass, alive = _random_scene(rng, 300, 512)
    t = _build(pos, mass, alive)
    assert int(t.count[0]) == 300
    # smass zero beyond alive
    assert (np.asarray(t.smass)[300:] == 0).all()
