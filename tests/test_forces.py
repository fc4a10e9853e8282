"""All-pairs force tests: XLA fallback vs NumPy oracle, Pallas (interpret)
vs XLA, softening semantics, dead-body neutrality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.ops import forces
from tests import oracle


def _random_bodies(rng, n, dim=2):
    pos = rng.random((n, dim)) * 1000.0
    mass = rng.random(n) * 10.0 + 0.1
    return pos.astype(np.float32), mass.astype(np.float32)


def test_xla_matches_numpy_oracle(rng):
    pos, mass = _random_bodies(rng, 257)
    got = forces.accel_allpairs(jnp.asarray(pos), jnp.asarray(mass),
                                80.0, 1.0, implementation="xla")
    want = oracle.exact_accel(pos.astype(np.float64),
                              mass.astype(np.float64), 80.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)


def test_xla_3d(rng):
    pos, mass = _random_bodies(rng, 100, dim=3)
    got = forces.accel_allpairs(jnp.asarray(pos), jnp.asarray(mass),
                                80.0, 1.0, implementation="xla")
    want = oracle.exact_accel(pos.astype(np.float64),
                              mass.astype(np.float64), 80.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-4)


def test_pallas_interpret_matches_xla(rng, monkeypatch):
    """Run the TPU kernel logic in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    pos, mass = _random_bodies(rng, 600)
    got = forces.accel_allpairs(jnp.asarray(pos), jnp.asarray(mass),
                                80.0, 1.0, implementation="pallas")
    want = forces.accel_allpairs(jnp.asarray(pos), jnp.asarray(mass),
                                 80.0, 1.0, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dead_bodies_are_force_neutral(rng):
    pos, mass = _random_bodies(rng, 64)
    mass2 = mass.copy()
    mass2[32:] = 0.0  # dead
    a_all = forces.accel_allpairs(jnp.asarray(pos[:32]),
                                  jnp.asarray(mass[:32]), 80.0, 1.0,
                                  implementation="xla")
    a_mask = forces.accel_allpairs(jnp.asarray(pos), jnp.asarray(mass2),
                                   80.0, 1.0, implementation="xla")
    np.testing.assert_allclose(np.asarray(a_all), np.asarray(a_mask)[:32],
                               rtol=1e-6)


def test_softening_in_force_law():
    """Two unit masses at distance d: |a| = G / (d^2 + eps^2)."""
    pos = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])  # d = 5
    mass = jnp.asarray([1.0, 1.0])
    a = forces.accel_allpairs(pos, mass, 80.0, 2.0, implementation="xla")
    expect = 80.0 / (25.0 + 2.0) * (5.0 / np.sqrt(27.0))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a)[0]), expect,
                               rtol=1e-6)


@pytest.mark.parametrize("d0", [1.0, 2.5, 7.0])
def test_potential_energy_consistent_with_force(d0):
    """-dU/dr equals the implemented force magnitude (finite difference).

    The force is the Plummer-softened G m M r / (r^2 + eps^2)^1.5
    (BarnesHutAlg.kt:250-259) — checked at r = eps, where the previously-used
    atan-form potential was 41% off.
    """
    G, soft2 = 80.0, 1.0
    m = jnp.asarray([2.0, 3.0])

    def U(d):
        pos = jnp.asarray([[0.0, 0.0], [d, 0.0]])
        return float(forces.potential_energy(pos, m, G, soft2))

    h = 0.05
    dU = (U(d0 + h) - U(d0 - h)) / (2 * h)  # f32 energies: keep h coarse
    f = G * 2.0 * 3.0 * d0 / (d0 * d0 + soft2) ** 1.5
    np.testing.assert_allclose(dU, f, rtol=5e-3)


def test_potential_energy_closed_form():
    """U = -G m M / sqrt(r^2 + eps^2) exactly for one pair."""
    pos = jnp.asarray([[0.0, 0.0], [3.0, 4.0]])  # r = 5
    m = jnp.asarray([2.0, 3.0])
    got = float(forces.potential_energy(pos, m, 80.0, 1.0))
    want = -80.0 * 2.0 * 3.0 / np.sqrt(26.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_band_pallas_interpret_matches_xla_band(rng, monkeypatch):
    """P3M band-pass Pallas kernel (ops/band_pallas.py) vs the production
    XLA block-tridiagonal form: identical coverage and pair math, so the
    results must match bitwise up to summation order (same (S,3S) blocks,
    same order -> exactly equal in practice)."""
    from jax.experimental import pallas as pl

    from tpu_nbody.ops import mesh as mesh_ops
    from tpu_nbody.ops import band_pallas

    real_call = pl.pallas_call

    def interp_call(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    cap = 4096
    pos = (rng.random((cap, 2)) * [2400.0, 800.0]).astype(np.float32)
    mass = (rng.random(cap) + 0.1).astype(np.float32)
    a = 2.5 * (2404.0 / 4096)
    ref = mesh_ops._band_short_range(jnp.asarray(pos), jnp.asarray(mass),
                                     jnp.float32(1.0), a, band=128,
                                     chunk=2048)
    got = band_pallas.band_short_range_pallas(
        jnp.asarray(pos), jnp.asarray(mass), jnp.float32(1.0),
        jnp.float32(a))
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6 * scale)
