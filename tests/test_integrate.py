"""Integrator tests: order, conservation, reversibility, parity structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_nbody.config import Params
from tpu_nbody.ops import forces, integrate
from tpu_nbody.state import from_arrays
from tests import oracle


def _two_body(dtype=jnp.float64):
    """Circular binary: m1 = m2 = 1, separation 10, softened G=80 orbit."""
    G, soft2 = 80.0, 1.0
    d = 10.0
    # circular speed for the softened force: a = G*m/(d^2+eps^2), each body
    # orbits the COM at radius d/2: v^2/(d/2) = a
    a = G * 1.0 / (d * d + soft2) * (d / np.sqrt(d * d + soft2))
    v = np.sqrt(a * d / 2)
    pos = np.array([[-d / 2, 0.0], [d / 2, 0.0]])
    vel = np.array([[0.0, -v], [0.0, v]])
    mass = np.array([1.0, 1.0])
    return pos, vel, mass, G, soft2


def _accel(pos, mass, alive, params):
    return forces.accel_allpairs(pos, jnp.where(alive, mass, 0.0), params.G,
                                 params.soft2, implementation="xla")


def _energy(state, params):
    ke = 0.5 * jnp.sum(state.mass * jnp.sum(state.vel ** 2, -1))
    pe = forces.potential_energy(state.pos, state.mass, params.G, params.soft2)
    return float(ke + pe)


def _run(pos, vel, mass, dt, n, stepper):
    params = Params.default(dt=dt, merge_min_dist=0.0)
    state = from_arrays(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(vel, jnp.float32),
                        jnp.asarray(mass, jnp.float32))
    e0 = _energy(state, params)
    for _ in range(n):
        state = stepper(state, params, _accel)
    return state, e0, _energy(state, params)


def test_kdk_energy_second_order():
    """Leapfrog: energy error scales ~dt^2."""
    pos, vel, mass, _, _ = _two_body()
    errs = []
    for dt, n in [(0.02, 200), (0.01, 400)]:
        _, e0, e1 = _run(pos, vel, mass, dt, n, integrate.kdk_step)
        errs.append(abs(e1 - e0) / abs(e0))
    # halving dt should shrink error ~4x (allow slack for f32)
    assert errs[1] < errs[0] / 2.0


def test_kdk_reuse_matches_kdk_without_merge():
    pos, vel, mass, _, _ = _two_body()
    params = Params.default(dt=0.01, merge_min_dist=0.0)
    s_lit = from_arrays(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(vel, jnp.float32), jnp.asarray(mass, jnp.float32))
    s_re = s_lit
    acc = _accel(s_re.pos, s_re.mass, s_re.alive, params)
    for _ in range(20):
        s_lit = integrate.kdk_step(s_lit, params, _accel)
        s_re, acc = integrate.kdk_reuse_step(s_re, acc, params, _accel)
    np.testing.assert_allclose(np.asarray(s_lit.pos), np.asarray(s_re.pos),
                               rtol=1e-4, atol=1e-4)


def test_momentum_conserved_without_merge(rng):
    n = 64
    pos = rng.random((n, 2)).astype(np.float32) * 500
    vel = rng.standard_normal((n, 2)).astype(np.float32)
    mass = rng.random(n).astype(np.float32) + 0.5
    state, _, _ = _run(pos, vel, mass, 0.005, 50, integrate.kdk_step)
    p0 = (mass[:, None] * vel).sum(0)
    p1 = np.asarray((state.mass[:, None] * state.vel).sum(0))
    np.testing.assert_allclose(p1, p0, atol=2e-2 * np.abs(p0).max() + 1e-2)


def test_time_reversal():
    """Leapfrog is symplectic/reversible: +dt then -dt returns to start.

    Negative dt is a supported reference feature (NBodyPanel.kt:256-257).
    """
    pos, vel, mass, _, _ = _two_body()
    params = Params.default(dt=0.01, merge_min_dist=0.0)
    s = from_arrays(jnp.asarray(pos, jnp.float32),
                    jnp.asarray(vel, jnp.float32), jnp.asarray(mass, jnp.float32))
    for _ in range(25):
        s = integrate.kdk_step(s, params, _accel)
    params_r = params.replace(dt=-0.01)
    for _ in range(25):
        s = integrate.kdk_step(s, params_r, _accel)
    np.testing.assert_allclose(np.asarray(s.pos), pos, atol=1e-2)


def test_kdk_matches_oracle_trajectory(rng):
    """Literal 2-pass KDK against the NumPy oracle's exact-force KDK."""
    n = 32
    pos = (rng.random((n, 2)) * 200 + 1100).astype(np.float64)
    vel = rng.standard_normal((n, 2)) * 2
    mass = rng.random(n) + 0.5
    G, soft2, dt = 80.0, 1.0, 0.005

    params = Params.default(dt=dt, merge_min_dist=0.0)
    s = from_arrays(jnp.asarray(pos, jnp.float32),
                    jnp.asarray(vel, jnp.float32), jnp.asarray(mass, jnp.float32))
    opos, ovel = pos.copy(), vel.copy()
    accel_np = lambda p, m: oracle.exact_accel(p, m, G, soft2)
    for _ in range(20):
        s = integrate.kdk_step(s, params, _accel)
        opos, ovel = oracle.kdk_step(opos, ovel, mass, dt, accel_np)
    np.testing.assert_allclose(np.asarray(s.pos), opos, rtol=1e-3, atol=2e-2)


def test_drift_tracks_oracle_on_reference_scene():
    """The rebuilt integrator reproduces the reference-math oracle's energy
    drift on the canonical scene (the drift itself is large — the reference's
    dt under-resolves the inner orbits; parity means matching that curve)."""
    from tpu_nbody.models import scenes

    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(0),
                                            n1=120, n2=40)
    pos0 = np.asarray(p, np.float64)
    vel0 = np.asarray(v, np.float64)
    mass0 = np.asarray(m, np.float64)
    G, soft2, dt, steps = 80.0, 1.0, 0.005, 150

    def energy(pos, vel):
        ke = 0.5 * (mass0 * (vel ** 2).sum(1)).sum()
        d = pos[None] - pos[:, None]
        r = np.sqrt((d * d).sum(-1))
        u = -(np.pi / 2 - np.arctan2(r, 1.0))
        np.fill_diagonal(u, 0.0)
        return ke + 0.5 * G * (mass0[:, None] * mass0[None, :] * u).sum()

    e0 = energy(pos0, vel0)
    pos, vel = pos0.copy(), vel0.copy()
    for _ in range(steps):
        pos, vel = oracle.kdk_step(pos, vel, mass0, dt,
                                   lambda p_, m_: oracle.exact_accel(
                                       p_, m_, G, soft2))
    drift_oracle = abs(energy(pos, vel) - e0) / abs(e0)

    params = Params.default(dt=dt, merge_min_dist=0.0)
    state = from_arrays(p, v, m)
    for _ in range(steps):
        state = integrate.kdk_step(state, params, _accel)
    drift_ours = abs(energy(np.asarray(state.pos, np.float64),
                            np.asarray(state.vel, np.float64)) - e0) / abs(e0)
    # chaotic trajectories diverge; the drift MAGNITUDE must match
    assert drift_ours < max(3 * drift_oracle, drift_oracle + 0.05)
    assert drift_oracle < max(3 * drift_ours, drift_ours + 0.05)


def test_euler_step_semantics():
    """Semi-implicit Euler: v' = v + a*dt, x' = x + v'*dt (GPU.kt:147-148)."""
    pos = jnp.asarray([[0.0, 0.0], [10.0, 0.0]])
    vel = jnp.asarray([[0.0, 1.0], [0.0, -1.0]])
    mass = jnp.asarray([1.0, 1.0])
    params = Params.default(dt=0.25, merge_min_dist=0.0)
    s = from_arrays(pos, vel, mass)
    a = np.asarray(_accel(s.pos, s.mass, s.alive, params))
    s2 = integrate.euler_step(s, params, _accel)
    vexp = np.asarray(vel) + a * 0.25
    np.testing.assert_allclose(np.asarray(s2.vel), vexp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.pos),
                               np.asarray(pos) + vexp * 0.25, rtol=1e-6)
