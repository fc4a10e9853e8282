"""Multi-chip Barnes-Hut: domain-decomposed trees + LET exchange.

Scales the reference's core algorithm (``BarnesHutAlg.kt:95-275``) across a
device mesh (SURVEY §7 step 6, BASELINE config[4]) the TPU way:

* Bodies are DOMAIN-DECOMPOSED along ``"b"`` via
  :func:`~tpu_nbody.parallel.sharded_pm.reshard_by_hilbert`: each shard owns
  a contiguous Hilbert-curve segment (a compact spatial domain).
* Each shard builds its OWN flat quadtree over its local bodies with the
  unchanged scatter-free builder (:func:`tpu_nbody.ops.tree.build_tree`),
  using the global root quad so cells are globally consistent.
* Cross-shard forces ride a **locally-essential export**: every shard runs
  the group-MAC wave traversal (:func:`tpu_nbody.ops.traverse._traverse_all`)
  over its local tree ONCE PER REMOTE DOMAIN, with the remote domain's
  alive-bounding-box standing in as the "group" box. Accepted nodes export
  their (COM, mass) as point masses; rejected leaves export their actual
  bodies. Because every remote body lies inside its domain box and each
  node's COM lies inside its cell, an accepted export satisfies the
  reference's per-body MAC ``s^2 < theta^2 * (d^2 + eps^2)``
  (``BarnesHutAlg.kt:225-228``) for EVERY body of the destination domain —
  the classic LET guarantee, evaluated with the same conservative box
  criterion the single-chip group traversal uses. Boundary-adjacent cells
  (box gap 0) open all the way down, so near-boundary pairs are exchanged
  as exact bodies.
* Exports are fixed-capacity ``(P, E, 3)`` [x, y, m] buffers exchanged with
  ONE ``all_to_all`` over ICI; imported rows are force-evaluated densely
  against the local bodies (an MXU-friendly (n_local x P*E) pair block —
  the same formulation that wins for all-pairs). Dropped-row overflow is
  reported per step (``export_need``) and auto-retuned by the engine,
  exactly like the single-chip traversal caps.

Total force = local Barnes-Hut (unchanged single-chip machinery on the
local tree) + dense import sum. Every pair is counted exactly once: bodies
belong to exactly one shard, local pairs go through the local tree, cross
pairs through the export of their source shard.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.ops import traverse, tree as tree_lib
from tpu_nbody.parallel.mesh import BODY_AXIS
from tpu_nbody.parallel.sharded import _merge_sharded
from tpu_nbody.state import SimState


class ShardedBHStats(NamedTuple):
    """Replicated (pmax-reduced) per-step needs for cap auto-tuning."""
    trav: traverse.TraversalStats   # local-tree traversal needs
    export_need: jax.Array          # max rows any (src, dst) export wanted
    let_approx_need: jax.Array      # max accepted nodes per destination
    let_leaf_need: jax.Array        # max rejected leaves per destination
    let_frontier_need: jax.Array    # max BFS frontier during export builds
                                    # (a truncated frontier silently DROPS
                                    # cross-shard interactions — must stay
                                    # within let_frontier_cap)
    heavy_need: jax.Array


def _let_exports(tree, boxes_min, boxes_max, box_valid, me, theta2, soft2, *,
                 max_depth, frontier_cap, approx_cap, leaf_list_cap,
                 body_cap):
    """Build the (P, E, 3) export buffer [x, y, m] for every destination.

    Row ``j`` holds what this shard contributes to shard ``j``'s forces:
    MAC-accepted local nodes as (COM, mass) plus opened leaves' bodies.
    E = approx_cap + body_cap; invalid/padding rows carry mass 0.
    """
    nP = boxes_min.shape[0]
    gvalid = box_valid & (jnp.arange(nP) != me)
    approx, a_len, leaves, l_len, f_need = traverse._traverse_all(
        tree, boxes_min, boxes_max, gvalid, theta2, soft2,
        max_depth=max_depth, frontier_cap=frontier_cap,
        approx_cap=approx_cap, leaf_list_cap=leaf_list_cap)
    slots, svalid, s_total = traverse._direct_partners_all(
        tree, leaves, l_len, direct_body_cap=body_cap)

    avalid = (jnp.arange(approx_cap, dtype=jnp.int32)[None, :]
              < a_len[:, None])
    arows = tree.node_rows[jnp.where(avalid, approx, 0)]      # (P, A, 10)
    a_part = jnp.stack([arows[..., 1], arows[..., 2],
                        jnp.where(avalid, arows[..., 0], 0.0)], axis=-1)
    brows = tree.body_rows[slots]                             # (P, DB, 4)
    b_part = jnp.stack([brows[..., 0], brows[..., 1],
                        jnp.where(svalid, brows[..., 2], 0.0)], axis=-1)
    exports = jnp.concatenate([a_part, b_part], axis=1)       # (P, E, 3)
    need = jnp.max(a_len + s_total)
    return exports, need, jnp.max(a_len), jnp.max(l_len), jnp.max(f_need)


def _import_accel(pos, imports, soft2, chunk=1024):
    """Dense acceleration of local bodies vs all imported point masses."""
    n = pos.shape[0]
    rows = imports.reshape(-1, 3)
    pad = -(-n // chunk) * chunk
    posp = jnp.zeros((pad, 2), pos.dtype).at[:n].set(pos)

    def one(p_chunk):
        dx = rows[None, :, 0] - p_chunk[:, None, 0]
        dy = rows[None, :, 1] - p_chunk[:, None, 1]
        r2 = dx * dx + dy * dy + soft2
        w = rows[None, :, 2] * jax.lax.rsqrt(r2) / r2
        return jnp.stack([jnp.sum(w * dx, 1), jnp.sum(w * dy, 1)], -1)

    acc = jax.lax.map(one, posp.reshape(-1, chunk, 2))
    return acc.reshape(pad, 2)[:n]


def make_sharded_bh_step(mesh: Mesh, cfg: SimConfig, caps, *,
                         heavy_cap_local: int = 16,
                         let_approx_cap: int = 2048,
                         let_body_cap: int = 2048,
                         let_leaf_cap: int = 512,
                         let_frontier_cap: int = 4096,
                         axis: str = BODY_AXIS):
    """Jitted multi-chip BH step(state, params, n_steps) -> (state, stats).

    ``caps`` is the single-chip :class:`tpu_nbody.engine.Caps` applied to
    the per-shard local tree/traversal. Integration is kick-drift-kick with
    force reuse (one tree build + traversal + LET exchange per step) — the
    seed force pass runs in its own executable, same split as the
    single-chip engine (two traversal instances in one XLA program crash
    this backend's worker at large N; see engine.py).
    """
    n_shards = mesh.shape[axis]
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half

    def local_accel(pos, mass, alive, params):
        """(acc, stats) for the local shard, inside shard_map."""
        me = jax.lax.axis_index(axis)
        mass0 = jnp.where(alive, mass, 0.0)
        t = tree_lib.build_tree(pos, mass0, alive, origin, side,
                                num_nodes=caps.num_nodes,
                                leaf_size=cfg.leaf_size,
                                max_depth=cfg.max_depth)
        # traversal picked on the LOCAL (per-shard) capacity: dense
        # classification is O(groups x nodes) of the local tree
        from tpu_nbody.engine import BH_DENSE_MAX_CAP
        local_trav = (cfg.bh_traversal if cfg.bh_traversal != "auto"
                      else ("dense" if cfg.capacity // n_shards
                            <= BH_DENSE_MAX_CAP else "bfs"))
        acc, tstats = traverse.bh_accel_from_tree(
            t, params.theta, params.soft2, params.G,
            group_size=caps.group_size, group_cap=caps.group_cap,
            max_depth=cfg.max_depth, frontier_cap=caps.frontier_cap,
            approx_cap=caps.approx_cap, leaf_list_cap=caps.leaf_list_cap,
            direct_body_cap=caps.direct_body_cap,
            group_chunk=cfg.group_chunk, traversal=local_trav)

        # Alive bounding box of this domain; all_gather the P tiny boxes.
        big = jnp.asarray(jnp.finfo(pos.dtype).max, pos.dtype)
        bmin = jnp.min(jnp.where(alive[:, None], pos, big), axis=0)
        bmax = jnp.max(jnp.where(alive[:, None], pos, -big), axis=0)
        n_here = jnp.sum(alive.astype(jnp.int32))
        boxes_min = jax.lax.all_gather(bmin, axis)            # (P, 2)
        boxes_max = jax.lax.all_gather(bmax, axis)
        box_valid = jax.lax.all_gather(n_here, axis) > 0      # (P,)

        theta2 = params.theta * params.theta
        exports, e_need, a_need, l_need, f_need = _let_exports(
            t, boxes_min, boxes_max, box_valid, me, theta2, params.soft2,
            max_depth=cfg.max_depth, frontier_cap=let_frontier_cap,
            approx_cap=let_approx_cap, leaf_list_cap=let_leaf_cap,
            body_cap=let_body_cap)
        imports = jax.lax.all_to_all(exports, axis, split_axis=0,
                                     concat_axis=0, tiled=True)
        acc = acc + params.G * _import_accel(
            pos, imports, params.soft2,
            chunk=min(1024, pos.shape[0]))
        acc = acc * alive[:, None].astype(acc.dtype)

        pmax = lambda x: jax.lax.pmax(x, axis)
        stats = ShardedBHStats(
            trav=jax.tree.map(pmax, tstats),
            export_need=pmax(e_need), let_approx_need=pmax(a_need),
            let_leaf_need=pmax(l_need), let_frontier_need=pmax(f_need),
            heavy_need=jnp.int32(0))
        return acc, stats

    def seed_local(state: SimState, params: Params):
        return local_accel(state.pos, state.mass, state.alive, params)

    def loop_local(state: SimState, acc, params: Params):
        """One kdk_reuse step + sharded merge (single traversal instance)."""
        half = params.dt * 0.5
        vel = state.vel + acc * half
        pos = state.pos + vel * params.dt
        a2, stats = local_accel(pos, state.mass, state.alive, params)
        vel = vel + a2 * half
        state = state._replace(pos=pos, vel=vel, step=state.step + 1)
        state, heavy = _merge_sharded(state, params, axis=axis,
                                      n_shards=n_shards,
                                      heavy_cap_local=heavy_cap_local)
        return state, a2, stats._replace(heavy_need=heavy)

    sharded = P(axis)
    sharded2 = P(axis, None)
    state_specs = SimState(pos=sharded2, vel=sharded2, mass=sharded,
                           alive=sharded, step=P())
    param_specs = jax.tree.map(lambda _: P(), Params.default())
    stat_specs = jax.tree.map(lambda _: P(), ShardedBHStats(
        trav=traverse.TraversalStats(*([0] * 7)), export_need=0,
        let_approx_need=0, let_leaf_need=0, let_frontier_need=0,
        heavy_need=0))

    seed_fn = jax.jit(lambda s, p: jax.shard_map(
        seed_local, mesh=mesh, in_specs=(state_specs, param_specs),
        out_specs=(sharded2, stat_specs), check_vma=False)(s, p))

    one = lambda s, a, p: jax.shard_map(
        loop_local, mesh=mesh,
        in_specs=(state_specs, sharded2, param_specs),
        out_specs=(state_specs, sharded2, stat_specs),
        check_vma=False)(s, a, p)

    def max_stats(a, b):
        return jax.tree.map(jnp.maximum, a, b)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def loop_fn(state, acc0, seed_st, params, n_steps: int):
        # One traversal instance per executable (same structure as the
        # single-chip kdk_reuse loop): every step runs through the single
        # scan body — unrolling the first step next to the scan embeds a
        # second instance, the twin-traversal fault at large per-shard
        # capacity (engine.py loop_fn, PERFORMANCE.md).
        if n_steps == 1:
            state, acc, st = one(state, acc0, params)
            return state, max_stats(seed_st, st)

        def body(carry, _):
            s, a, acc_st = carry
            s, a, ss = one(s, a, params)
            return (s, a, max_stats(acc_st, ss)), None
        (state, acc, st), _ = jax.lax.scan(
            body, (state, acc0, seed_st), None, length=n_steps)
        return state, st

    def step_n(state: SimState, params: Params, n_steps: int = 1):
        acc0, seed_st = seed_fn(state, params)
        return loop_fn(state, acc0, seed_st, params, n_steps=n_steps)

    return step_n
