"""Merge/absorb rule vs the sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import Params
from tpu_nbody.ops.merge import merge_bodies
from tpu_nbody.state import from_arrays
from tests import oracle


def _apply(pos, vel, mass, max_mass=4000.0, min_dist=8.0, cap=None):
    state = from_arrays(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(vel, jnp.float32),
                        jnp.asarray(mass, jnp.float32), capacity=cap)
    params = Params.default(merge_max_mass=max_mass, merge_min_dist=min_dist)
    out, _ = merge_bodies(state, params, heavy_cap=16)
    return out


def test_basic_absorb():
    """One heavy body eats two close satellites; far one survives."""
    pos = np.array([[100.0, 100.0], [103.0, 100.0], [100.0, 95.0],
                    [150.0, 100.0]])
    vel = np.zeros_like(pos)
    mass = np.array([5000.0, 10.0, 20.0, 30.0])
    out = _apply(pos, vel, mass)
    alive = np.asarray(out.alive)
    m = np.asarray(out.mass)
    assert alive.tolist() == [True, False, False, True]
    assert m[0] == 5030.0
    # absorber position/velocity unchanged (momentum NOT conserved — parity)
    np.testing.assert_allclose(np.asarray(out.pos)[0], [100.0, 100.0])


def test_threshold_strictly_greater():
    """m > mergeMaxMass is strict (BarnesHutAlg.kt:474)."""
    pos = np.array([[0.0, 0.0], [1.0, 0.0]])
    mass = np.array([4000.0, 10.0])
    out = _apply(pos, np.zeros_like(pos), mass)
    assert np.asarray(out.alive).all()


def test_disabled_when_min_dist_nonpositive():
    pos = np.array([[0.0, 0.0], [1.0, 0.0]])
    mass = np.array([5000.0, 10.0])
    out = _apply(pos, np.zeros_like(pos), mass, min_dist=0.0)
    assert np.asarray(out.alive).all()


def test_two_heavies_lower_index_wins():
    """Two overlapping heavies: the lower index absorbs (scan order)."""
    pos = np.array([[0.0, 0.0], [3.0, 0.0]])
    mass = np.array([5000.0, 6000.0])
    out = _apply(pos, np.zeros_like(pos), mass)
    alive = np.asarray(out.alive)
    assert alive.tolist() == [True, False]
    assert np.asarray(out.mass)[0] == 11000.0


def test_matches_sequential_oracle(rng):
    """Random clustered configs vs the literal sequential rule."""
    for trial in range(10):
        n = 40
        pos = rng.random((n, 2)) * 60.0  # dense: plenty of <8px pairs
        vel = rng.standard_normal((n, 2))
        mass = rng.random(n) * 100.0
        heavy_ids = rng.choice(n, size=3, replace=False)
        mass[heavy_ids] = 5000.0 + rng.random(3) * 1000
        # Keep heavies >8px apart so round-2 chains don't trigger (the
        # documented deviation needs 3+ heavies within 8px of each other).
        pos[heavy_ids] = np.array([[10.0, 10.0], [30.0, 30.0], [50.0, 10.0]])

        opos, ovel, omass, okept = oracle.merge_sequential(
            pos.copy(), vel.copy(), mass.copy(), 4000.0, 8.0)
        out = _apply(pos, vel, mass)
        alive = np.asarray(out.alive)
        kept = np.where(alive)[0]
        assert kept.tolist() == okept.tolist(), f"trial {trial}"
        np.testing.assert_allclose(np.asarray(out.mass)[kept], omass,
                                   rtol=1e-5)


def test_overlapping_heavy_pair_with_satellites(rng):
    """Heavy pair within range + satellites — exercises round 2."""
    pos = np.array([[0.0, 0.0], [4.0, 0.0], [2.0, 3.0], [100.0, 0.0]])
    vel = np.zeros_like(pos)
    mass = np.array([5000.0, 7000.0, 5.0, 5.0])
    opos, ovel, omass, okept = oracle.merge_sequential(
        pos.copy(), vel.copy(), mass.copy(), 4000.0, 8.0)
    out = _apply(pos, vel, mass)
    kept = np.where(np.asarray(out.alive))[0]
    assert kept.tolist() == okept.tolist()
    np.testing.assert_allclose(np.asarray(out.mass)[kept], omass, rtol=1e-5)


def test_merge_in_padded_state():
    pos = np.array([[0.0, 0.0], [2.0, 0.0]])
    mass = np.array([5000.0, 7.0])
    out = _apply(pos, np.zeros_like(pos), mass, cap=64)
    assert int(out.n_alive()) == 1
    assert float(out.mass.sum()) == 5007.0


def test_heavy_need_reported():
    """heavy_need counts every qualifying heavy, beyond the static cap."""
    n = 24
    pos = np.stack([np.linspace(0.0, 2300.0, n), np.full(n, 50.0)], axis=1)
    mass = np.full(n, 5000.0, np.float32)
    state = from_arrays(jnp.asarray(pos, jnp.float32),
                        jnp.zeros((n, 2), jnp.float32),
                        jnp.asarray(mass), capacity=32)
    params = Params.default()
    _, need = merge_bodies(state, params, heavy_cap=4)
    assert int(need) == n


def test_hundred_black_holes_no_absorber_dropped():
    """100 heavies, each with one satellite in range: with the engine-style
    heavy_cap retune (cap >= heavy_need) EVERY absorber eats its satellite —
    the reference scans every heavy unconditionally
    (BarnesHutAlg.kt:463-532)."""
    nbh = 100
    xs = np.linspace(0.0, 2300.0, nbh)
    pos = np.concatenate([np.stack([xs, np.full(nbh, 100.0)], 1),
                          np.stack([xs + 2.0, np.full(nbh, 100.0)], 1)])
    mass = np.concatenate([np.full(nbh, 5000.0), np.full(nbh, 1.0)])
    state = from_arrays(jnp.asarray(pos, jnp.float32),
                        jnp.zeros((2 * nbh, 2), jnp.float32),
                        jnp.asarray(mass, jnp.float32), capacity=256)
    params = Params.default()

    out, need = merge_bodies(state, params, heavy_cap=16)
    assert int(need) == nbh  # the overflow is detectable...
    out, need = merge_bodies(state, params, heavy_cap=int(need))
    assert int(need) == nbh  # ...and at cap >= need nothing is dropped
    alive = np.asarray(out.alive)
    assert alive[:nbh].all() and not alive[nbh:2 * nbh].any()
    np.testing.assert_allclose(np.asarray(out.mass)[:nbh], 5001.0)
