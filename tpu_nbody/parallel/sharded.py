"""Multi-chip simulation step: shard_map + ring exchange over ICI.

Bodies are data-parallel over the mesh axis ``"b"`` (each chip owns
``capacity / P`` body slots). The exact force pass is a ring all-pairs: each
chip accumulates partial forces of its resident bodies against a visiting
tile of (pos, mass) that circulates the ring via ``lax.ppermute`` — the
ring-attention dataflow applied to gravity (SURVEY §5.7: the TPU-native
equivalent of the reference GPU kernel's shared-memory tiling,
``gpu/GPU.kt:128-145``, stretched across chips). The merge rule gathers the
(few) heavy absorber candidates globally with ``all_gather`` and resolves
victims locally, reducing mass gains with ``psum`` — same semantics as the
single-chip rule in :mod:`tpu_nbody.ops.merge`.

Everything compiles under one ``shard_map``-wrapped jit; the driver validates
it on a virtual CPU mesh (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_nbody.config import Params
from tpu_nbody.parallel.mesh import BODY_AXIS
from tpu_nbody.state import SimState


def _accel_vs_tile(pos, tile_pos, tile_mass, soft2, chunk=1024):
    """Partial acceleration of local bodies vs one visiting tile (no G)."""
    n = pos.shape[0]
    pad = -(-n // chunk) * chunk
    posp = jnp.zeros((pad, pos.shape[1]), pos.dtype).at[:n].set(pos)

    def one(p_chunk):
        d = tile_pos[None, :, :] - p_chunk[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + soft2
        w = tile_mass[None, :] * jax.lax.rsqrt(r2) / r2
        return jnp.einsum("cn,cnd->cd", w, d)

    acc = jax.lax.map(one, posp.reshape(-1, chunk, pos.shape[1]))
    return acc.reshape(pad, pos.shape[1])[:n]


def ring_allpairs_accel(pos, mass, G, soft2, *, axis=BODY_AXIS, n_shards: int):
    """Exact all-pairs acceleration inside shard_map via a ppermute ring."""
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    tile_pos, tile_mass = pos, mass
    acc = jnp.zeros_like(pos)
    for k in range(n_shards):
        acc = acc + _accel_vs_tile(pos, tile_pos, tile_mass, soft2)
        if k + 1 < n_shards:
            tile_pos = jax.lax.ppermute(tile_pos, axis, perm)
            tile_mass = jax.lax.ppermute(tile_mass, axis, perm)
    return G * acc


def _merge_sharded(state: SimState, params: Params, *, axis, n_shards,
                   heavy_cap_local: int):
    """Sharded absorb rule (see ops/merge.py for semantics + citations).

    Returns ``(state, heavy_need)``: the max per-shard count of qualifying
    heavies (identical on every shard via pmax). When it exceeds
    ``heavy_cap_local`` the lightest local heavies were silently excluded
    from absorbing — the caller should rebuild with a larger cap.
    """
    nl = state.pos.shape[0]  # local slots
    shard = jax.lax.axis_index(axis)
    gidx_local = shard * nl + jnp.arange(nl)  # global body ids
    md2 = params.merge_min_dist * params.merge_min_dist

    heavy = state.alive & (state.mass > params.merge_max_mass)
    heavy_need = jax.lax.pmax(jnp.sum(heavy.astype(jnp.int32)), axis)
    heavy_need = jnp.where(params.merge_min_dist > 0, heavy_need, 0)
    key = jnp.where(heavy, state.mass, -jnp.inf)
    _, hloc = jax.lax.top_k(key, heavy_cap_local)
    hvalid = heavy[hloc]
    hpos = state.pos[hloc]
    hgidx = jnp.where(hvalid, gidx_local[hloc], jnp.iinfo(jnp.int32).max)

    # Global heavy table: (P * heavy_cap_local, ...)
    all_hpos = jax.lax.all_gather(hpos, axis).reshape(-1, state.pos.shape[1])
    all_hgidx = jax.lax.all_gather(hgidx, axis).reshape(-1)
    all_hvalid = jax.lax.all_gather(hvalid, axis).reshape(-1)

    d = state.pos[:, None, :] - all_hpos[None, :, :]
    # merge_min_dist <= 0 disables merging (BarnesHutAlg.kt:465).
    close = (jnp.sum(d * d, axis=-1) < md2) & (params.merge_min_dist > 0)
    eligible = (close & all_hvalid[None, :] & state.alive[:, None]
                & (gidx_local[:, None] != all_hgidx[None, :]))

    big = jnp.iinfo(jnp.int32).max
    nH = all_hgidx.shape[0]

    def lowest(elig):
        """(absorber global id, heavy-table slot) = lowest-index heavy."""
        cand = jnp.where(elig, all_hgidx[None, :], big)
        slot = jnp.argmin(cand, axis=1)
        return jnp.min(cand, axis=1), slot

    absorber, _ = lowest(eligible)
    is_victim = absorber < big
    # Heavies absorbed by a lower-index heavy never absorb (round 2).
    h_is_victim_local = is_victim[hloc] & (absorber[hloc] < gidx_local[hloc])
    all_h_absorbed = jax.lax.all_gather(h_is_victim_local, axis).reshape(-1)
    eligible2 = eligible & ~all_h_absorbed[None, :]
    absorber, slot = lowest(eligible2)
    is_victim = absorber < big

    # Mass transfer: sum victims per heavy-table slot, reduce across shards.
    gained = jax.ops.segment_sum(
        jnp.where(is_victim, state.mass, 0.0),
        jnp.where(is_victim, slot, nH),
        num_segments=nH + 1)[:nH]
    gained = jax.lax.psum(gained, axis)

    # Apply gains to locally-owned heavies.
    mine = (all_hgidx // nl) == shard
    local_slot = jnp.where(mine, all_hgidx % nl, nl)
    mass = state.mass.at[local_slot].add(
        jnp.where(mine, gained, 0.0), mode="drop")
    mass = jnp.where(is_victim, 0.0, mass)
    alive = state.alive & ~is_victim
    return state._replace(mass=mass, alive=alive), heavy_need


def make_sharded_step(mesh: Mesh, *, integrator: str = "kdk",
                      heavy_cap_local: int = 16, axis: str = BODY_AXIS):
    """Jitted multi-chip step(state, params, n_steps) on ``mesh``.

    ``state`` must be sharded along ``axis`` (see
    :func:`tpu_nbody.parallel.mesh.shard_state`). All parallelism is explicit
    shard_map; one jit compiles the full ring + integrate + merge step.
    """
    n_shards = mesh.shape[axis]

    def accel(pos, mass, alive, params):
        m = jnp.where(alive, mass, 0.0)
        return ring_allpairs_accel(pos, m, params.G, params.soft2,
                                   axis=axis, n_shards=n_shards)

    def local_step(state: SimState, params: Params):
        a = accel(state.pos, state.mass, state.alive, params)
        half = params.dt * 0.5
        if integrator == "kdk":
            vel = state.vel + a * half
            pos = state.pos + vel * params.dt
            a2 = accel(pos, state.mass, state.alive, params)
            vel = vel + a2 * half
        elif integrator == "euler":
            vel = state.vel + a * params.dt
            pos = state.pos + vel * params.dt
        else:
            raise ValueError(integrator)
        state = state._replace(pos=pos, vel=vel, step=state.step + 1)
        return _merge_sharded(state, params, axis=axis, n_shards=n_shards,
                              heavy_cap_local=heavy_cap_local)

    sharded = P(axis)
    sharded2 = P(axis, None)
    state_specs = SimState(pos=sharded2, vel=sharded2, mass=sharded,
                           alive=sharded, step=P())
    param_specs = jax.tree.map(lambda _: P(), Params.default())

    def one(state, params):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, param_specs),
            out_specs=(state_specs, P()),
            check_vma=False,
        )(state, params)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_n(state: SimState, params: Params, n_steps: int = 1):
        """Returns (state, heavy_need) — max over the executed steps."""
        state, heavy = one(state, params)
        if n_steps == 1:
            return state, heavy

        def body(carry, _):
            s, h = carry
            s, h2 = one(s, params)
            return (s, jnp.maximum(h, h2)), None

        (state, heavy), _ = jax.lax.scan(body, (state, heavy), None,
                                         length=n_steps - 1)
        return state, heavy

    return step_n
