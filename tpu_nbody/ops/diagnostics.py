"""On-device diagnostics: energy, momentum, center of mass, body counts.

The reference's only observability is the Swing HUD / FPS counter
(``src/main/kotlin/NBodyPanel.kt:347-368``) and a full per-frame SSBO
readback to compute the GPU demo's center of mass on the host
(``src/main/kotlin/gpu/GPU.kt:390-411``). Here every reduction runs on
device; only O(1) scalars cross to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_nbody.ops import forces
from tpu_nbody.state import SimState


def kinetic_energy(state: SimState):
    v2 = jnp.sum(state.vel * state.vel, axis=-1)
    return 0.5 * jnp.sum(state.mass * v2)


def momentum(state: SimState):
    return jnp.sum(state.mass[:, None] * state.vel, axis=0)


def center_of_mass(state: SimState):
    m = jnp.sum(state.mass)
    com = jnp.sum(state.mass[:, None] * state.pos, axis=0)
    return jnp.where(m > 0, com / jnp.maximum(m, 1e-30), 0.0)


def angular_momentum_z(state: SimState):
    """L_z about the COM (2D scalar / 3D z-component)."""
    com = center_of_mass(state)
    r = state.pos - com
    return jnp.sum(state.mass * (r[:, 0] * state.vel[:, 1]
                                 - r[:, 1] * state.vel[:, 0]))


@functools.partial(jax.jit, static_argnames=("potential",))
def stats(state: SimState, params, potential: bool = True):
    """Scalar HUD dict (device-computed): the SURVEY §5.5 rebuild plan.

    ``potential`` controls the O(N^2) pairwise potential-energy sum — leave
    it off for very large N (the cheap O(N) scalars are always computed).
    """
    ke = kinetic_energy(state)
    out = {
        "n_alive": state.n_alive(),
        "step": state.step,
        "kinetic": ke,
        "momentum": momentum(state),
        "com": center_of_mass(state),
        "angular_momentum_z": angular_momentum_z(state),
        "total_mass": jnp.sum(state.mass),
    }
    if potential:
        pe = forces.potential_energy(state.pos, state.mass, params.G,
                                     params.soft2)
        out["potential"] = pe
        out["energy"] = ke + pe
    return out
