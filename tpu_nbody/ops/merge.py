"""Mass-threshold merge ("absorb") rule, fully on device.

Reference semantics (``src/main/kotlin/BarnesHutAlg.kt:463-532``): after each
step, every body i with ``m > mergeMaxMass`` (default 4000) absorbs ALL bodies
j within ``mergeMinDist`` (default Config.MIN_R = 8; <= 0 disables). The
absorber gains the victims' mass; its position/velocity are unchanged —
momentum is deliberately NOT conserved (lines 518-519). The reference scans
absorbers in ascending index order, so when two heavy bodies overlap the
lower-index one survives.

TPU-native formulation: heavy candidates are compressed to a static-size set
(top ``heavy_cap`` by mass), victims are found with one masked
(capacity x heavy_cap) distance test, absorber identity resolves to the
lowest-index qualifying heavy (matching the reference's scan order), and a
second resolution round removes absorbers that are themselves victims of a
lower-index heavy (reference: an absorbed heavy never gets to scan). Mass
transfers via segment-sum; victims die in the alive mask.

Deviations (documented): chains of 3+ mutually-overlapping heavies resolve
with two rounds instead of a full sequential scan, and a body absorbed this
step cannot push its absorber's subsequent same-step absorptions (those
happen next step). Both need >=3 heavies within 8px of each other — not
reachable from the reference's default scenes.

The reference scans EVERY heavy (``BarnesHutAlg.kt:463-532``); the static
``heavy_cap`` compression would silently drop the lightest absorbers past the
cap, so :func:`merge_bodies` also returns ``heavy_need`` — the number of
qualifying heavies — and the engine grows ``heavy_cap`` (and recompiles)
whenever ``heavy_need > heavy_cap``, exactly like the traversal caps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_nbody.state import SimState


@functools.partial(jax.jit, static_argnames=("heavy_cap",))
def merge_bodies(state: SimState, params,
                 heavy_cap: int = 64) -> tuple[SimState, jax.Array]:
    """Apply the absorb rule. Returns (state, heavy_need).

    ``heavy_need`` counts the alive bodies above ``merge_max_mass``; when it
    exceeds ``heavy_cap`` the lightest heavies did not get to absorb this
    step and the caller should retry with a larger cap.
    """
    cap = state.capacity
    heavy_cap = min(heavy_cap, cap)
    heavy_need = jnp.sum(
        (state.alive & (state.mass > params.merge_max_mass)).astype(jnp.int32))

    def run(state):
        md2 = params.merge_min_dist * params.merge_min_dist
        heavy = state.alive & (state.mass > params.merge_max_mass)
        # Compress heavies to heavy_cap slots, keeping the heaviest. Ordering
        # within the set is by body index (reference scan order).
        key = jnp.where(heavy, state.mass, -jnp.inf)
        _, hidx = jax.lax.top_k(key, heavy_cap)
        hvalid = heavy[hidx]
        hidx = jnp.where(hvalid, hidx, cap)  # park invalid at sentinel
        hpos = state.pos[jnp.clip(hidx, 0, cap - 1)]

        d = state.pos[:, None, :] - hpos[None, :, :]          # (cap, H, dim)
        close = jnp.sum(d * d, axis=-1) < md2
        body_idx = jnp.arange(cap)
        eligible = (close & hvalid[None, :] & state.alive[:, None]
                    & (body_idx[:, None] != hidx[None, :]))

        # Round 1: absorber(j) = lowest-index heavy near j.
        def lowest_absorber(elig):
            cand = jnp.where(elig, hidx[None, :], cap)
            a = jnp.min(cand, axis=1)          # absorber body index or cap
            return a

        absorber = lowest_absorber(eligible)
        is_victim = absorber < cap
        # Round 2: a heavy that is itself a victim of a LOWER-index heavy
        # never scans; drop it from the absorber set and re-resolve.
        heavy_is_victim = jnp.zeros((cap + 1,), bool).at[jnp.where(
            is_victim, body_idx, cap)].set(True)[:cap]
        absorbed_by_lower = heavy_is_victim & (absorber < body_idx)
        still_absorber = hvalid & ~absorbed_by_lower[jnp.clip(hidx, 0, cap - 1)]
        eligible2 = eligible & still_absorber[None, :]
        absorber = lowest_absorber(eligible2)
        is_victim = absorber < cap

        gained = jax.ops.segment_sum(
            jnp.where(is_victim, state.mass, 0.0), absorber,
            num_segments=cap + 1)[:cap]
        mass = jnp.where(is_victim, 0.0, state.mass + gained)
        alive = state.alive & ~is_victim
        return state._replace(mass=mass, alive=alive)

    enabled = (params.merge_min_dist > 0) & (state.n_alive() > 1)
    out = jax.lax.cond(enabled, run, lambda s: s, state)
    return out, jnp.where(enabled, heavy_need, 0)
