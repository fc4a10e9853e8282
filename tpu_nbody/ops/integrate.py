"""Time integrators.

* :func:`kdk_step` — literal kick-drift-kick leapfrog with two force passes
  per step, the reference CPU engine's scheme
  (``src/main/kotlin/BarnesHutAlg.kt:405-439``).
* :func:`kdk_reuse_step` — standard leapfrog optimization: a(t+dt) from the
  previous step's closing kick is reused as this step's opening a(t), so only
  one tree build + force pass runs per step (SURVEY §7 notes this is the
  intended fast mode; the literal 2-pass mode remains for strict parity).
* :func:`euler_step` — semi-implicit Euler, the reference GPU demo's
  integrator (``src/main/kotlin/gpu/GPU.kt:147-148``).

All integrators update every slot (dead slots carry mass 0 and zero forces);
negative dt (time reversal, allowed by the reference's O/P keys down to
-0.05, ``NBodyPanel.kt:256-257``) works unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_nbody.state import SimState


def kdk_step(state: SimState, params, accel_fn) -> SimState:
    """One literal KDK step: a(t) kick/2, drift, a(t+dt) kick/2."""
    a = accel_fn(state.pos, state.mass, state.alive, params)
    half = params.dt * 0.5
    vel = state.vel + a * half
    pos = state.pos + vel * params.dt
    a2 = accel_fn(pos, state.mass, state.alive, params)
    vel = vel + a2 * half
    return state._replace(pos=pos, vel=vel, step=state.step + 1)


def kdk_reuse_step(state: SimState, acc, params, accel_fn):
    """One KDK step reusing the carried a(t); returns (state, a(t+dt)).

    Carry convention: ``acc`` must equal accel(state) — seed the scan carry
    with one accel evaluation.
    """
    half = params.dt * 0.5
    vel = state.vel + acc * half
    pos = state.pos + vel * params.dt
    a2 = accel_fn(pos, state.mass, state.alive, params)
    vel = vel + a2 * half
    return state._replace(pos=pos, vel=vel, step=state.step + 1), a2


def euler_step(state: SimState, params, accel_fn) -> SimState:
    """Semi-implicit Euler: v += a*dt; x += v*dt (GPU demo parity)."""
    a = accel_fn(state.pos, state.mass, state.alive, params)
    vel = state.vel + a * params.dt
    pos = state.pos + vel * params.dt
    return state._replace(pos=pos, vel=vel, step=state.step + 1)
