"""Simulation state: a fixed-capacity structure-of-arrays pytree.

The reference stores a ``MutableList<Body>`` of mutable 2D records
(``src/main/kotlin/BarnesHutAlg.kt:21-25,295``) and resizes it on every scene
edit. TPU-native equivalent: device arrays of static shape ``(capacity, dim)``
with an ``alive`` mask; dead slots carry mass 0 so they are force-neutral by
construction. Scene edits (add disk, clear, merge deaths) are functional
updates of the same pytree — no reallocation, no host round-trips of per-body
data.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SimState(NamedTuple):
    pos: jax.Array    # (capacity, dim) float
    vel: jax.Array    # (capacity, dim) float
    mass: jax.Array   # (capacity,) float; 0 for dead slots
    alive: jax.Array  # (capacity,) bool
    step: jax.Array   # () int32 — global step counter (for checkpoint/resume)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def dim(self) -> int:
        return self.pos.shape[1]

    def n_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))


def empty_state(capacity: int, dim: int = 2, dtype=jnp.float32) -> SimState:
    return SimState(
        pos=jnp.zeros((capacity, dim), dtype),
        vel=jnp.zeros((capacity, dim), dtype),
        mass=jnp.zeros((capacity,), dtype),
        alive=jnp.zeros((capacity,), bool),
        step=jnp.zeros((), jnp.int32),
    )


def from_arrays(pos, vel, mass, capacity: int | None = None) -> SimState:
    """Build a state from dense (n, dim) arrays, padding up to ``capacity``."""
    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    n, dim = pos.shape
    cap = capacity or n
    if n > cap:
        raise ValueError(f"{n} bodies exceed capacity {cap}")
    st = empty_state(cap, dim, pos.dtype)
    st = st._replace(
        pos=st.pos.at[:n].set(pos),
        vel=st.vel.at[:n].set(vel),
        mass=st.mass.at[:n].set(mass),
        alive=st.alive.at[:n].set(True),
    )
    return st


def concat_bodies(state: SimState, pos, vel, mass) -> SimState:
    """Append new bodies into free slots (functional).

    Mirrors the reference's concat-into-new-list semantics on disk insertion
    (``src/main/kotlin/NBodyPanel.kt:228-234``), except capacity is fixed: new
    bodies fill the lowest free slots. Raises at trace time only via the
    static shapes; silently drops bodies beyond capacity (callers should check
    ``n_alive``). Host-orchestrated (not inside lax.scan).
    """
    pos = jnp.asarray(pos)
    k = pos.shape[0]
    # Rank free slots: alive slots get rank infinity.
    free_rank = jnp.where(state.alive, np.iinfo(np.int32).max, 0)
    order = jnp.argsort(free_rank, stable=True)  # free slots first
    slots = order[:k]
    can = ~state.alive[slots]  # only fill genuinely free slots
    return state._replace(
        pos=state.pos.at[slots].set(jnp.where(can[:, None], pos, state.pos[slots])),
        vel=state.vel.at[slots].set(jnp.where(can[:, None], jnp.asarray(vel), state.vel[slots])),
        mass=state.mass.at[slots].set(jnp.where(can, jnp.asarray(mass), state.mass[slots])),
        alive=state.alive.at[slots].set(state.alive[slots] | can),
    )


def clear(state: SimState) -> SimState:
    """Remove all bodies (middle-mouse clear, ``NBodyPanel.kt:143-146``)."""
    return empty_state(state.capacity, state.dim, state.pos.dtype)._replace(step=state.step)


def compact(state: SimState) -> SimState:
    """Pack alive bodies to the front (host-side maintenance op).

    Keeps relative order of alive bodies. Useful between scan segments after
    many merges; not required for correctness.
    """
    rank = jnp.where(state.alive, 0, 1)
    order = jnp.argsort(rank, stable=True)
    return state._replace(
        pos=state.pos[order],
        vel=state.vel[order],
        mass=jnp.where(state.alive[order], state.mass[order], 0.0),
        alive=state.alive[order],
    )
