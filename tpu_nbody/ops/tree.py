"""Flat adaptive quadtree built on device from Hilbert-sorted bodies.

Replaces the reference's pointer-based recursive ``BHTree``
(``src/main/kotlin/BarnesHutAlg.kt:95-202``): insert-one-body-at-a-time with
subdivide-on-collision and a post-order ``computeMass`` recursion. The
TPU-native build exploits a key property of space-filling-curve sorts
(cf. the Cornerstone octree construction family): after sorting bodies by
Hilbert code, the ENTIRE adaptive tree is a pure function of the sorted code
array — every node is a contiguous body range delimited by code-prefix
boundaries. The build is therefore branch-free and scatter-free:

1. Hilbert-encode and sort alive bodies (dead slots sort last).
2. Boundary analysis for ALL levels at once on ``(L, cap)`` arrays:
   boundary masks (``prefix[i] != prefix[i-1]``), per-body cell start/end
   via batched max/min prefix scans along the body axis, and a "path-alive"
   mask (a cumulative AND down the level axis) that descends only through
   internal (count > leaf_size) cells. A cell is a node iff every ancestor
   is internal; it is a leaf iff small enough or at max depth. Only
   OCCUPIED children exist (1-4 per internal node, contiguous ids).
3. The node table is materialized slot-wise: ONE flattened ``searchsorted``
   maps every node slot to (level, owner body), and each field is one
   gather from the pass-1 arrays. Cell geometry comes from the owner
   body's integer grid coordinates masked to the level — no Hilbert
   decode. No XLA scatter ops appear anywhere in the build: scatters into
   carried buffers proved pathologically slow on TPU (sequential
   lowering), which sank a first scatter-based implementation.
4. Aggregates: every node is a CONTIGUOUS body range ``[start, end)`` of
   the sorted order, so mass/COM numerators are prefix-sum differences.
   The prefix scan is compensated (two-sum pairs): a plain f32 cumsum of
   1M mass-weighted coordinates reaches ~1e8, and differencing it for a
   4-body node would lose ~7 absolute — percent-level COM error. The
   compensated pair bounds the differencing error by eps*|node sum| +
   eps^2*|total| instead. This replaces the per-level bottom-up
   ``computeMass`` sweep (``BarnesHutAlg.kt:173-202``) with three scans.

Everything is wide-not-deep: the round-2 build ran ~1000 small ops from
per-level python loops (~0.1 ms/op on this backend = 95 ms at N=100k);
this formulation runs a level-batched constant ~40 ops.

The root quad matches the reference sizing: centered at (W/2, H/2) with
half-side max(W, H)/2 + 2 (``BarnesHutAlg.kt:359-362``).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_nbody.ops import morton

_BIG = jnp.int32(2_000_000_000)


class Tree(NamedTuple):
    """Flat node table (capacity ``num_nodes``) + sorted body arrays.

    Nodes are grouped by level: all level-l nodes occupy one contiguous id
    block, children of one node are contiguous (``child .. child+n_children``).
    """

    # --- node table ---
    code: jax.Array        # (NC,) int32 Hilbert code of the cell's range start
    level: jax.Array       # (NC,) int32 depth (root = 0)
    start: jax.Array       # (NC,) int32 first body (sorted order)
    count: jax.Array       # (NC,) int32 bodies in subtree
    child: jax.Array       # (NC,) int32 first child id, -1 for leaves
    n_children: jax.Array  # (NC,) int32 number of occupied children (0-4)
    parent: jax.Array      # (NC,) int32 parent node, -1 for root
    mass: jax.Array        # (NC,) float total subtree mass
    com: jax.Array         # (NC, 2) float subtree center of mass
    n_nodes: jax.Array     # () int32 nodes actually in use (clipped to NC)
    node_need: jax.Array   # () int32 nodes the scene actually requires
                           # (unclipped; > NC means the table saturated and
                           # deep levels were truncated — grow num_nodes)
    # Packed per-node row for single-gather traversal: the backend moves a
    # multi-lane row at the same rate as one scalar, so fetching
    # [mass, comx, comy, cx, cy, side, child, nchild, start, count,
    #  pcx, pcy, pside, has_parent] as ONE row-gather is ~10x cheaper than
    # per-field gathers. Geometry (cx, cy, side) is precomputed at build so
    # the traversal never decodes codes; PARENT cell geometry (pcx, pcy,
    # pside; has_parent = 0.0 for the root) rides along so the local
    # monotone-MAC accept test ``pass(n) & ~pass(parent(n))`` needs no
    # second gather (used by the dense and hier traversals).
    node_rows: jax.Array   # (NC, 14) float32
    body_rows: jax.Array   # (cap, 4) float32: [x, y, exerted mass, 0]
    # --- sorted bodies ---
    spos: jax.Array        # (cap, 2) positions in Hilbert order
    smass: jax.Array       # (cap,) exerted mass in Hilbert order (0 = dead)
    sidx: jax.Array        # (cap,) original body index per sorted slot
    unsort: jax.Array      # (cap,) inverse permutation: orig -> sorted slot
    n_alive: jax.Array     # () int32
    # --- geometry ---
    origin: jax.Array      # (2,) root low corner
    root_side: jax.Array   # () root full side length

    def cell_geometry(self, node_ids):
        """(center (,2), side) of each node's cell, from code + level.

        The decoded point of a range-start Hilbert code is some corner of
        the cell; masking low bits by level gives the low corner.
        """
        code = self.code[node_ids]
        lvl = self.level[node_ids]
        ix, iy = morton.hilbert2d_inverse(code)
        shift = morton.COORD_BITS - lvl
        ix = (ix >> shift) << shift
        iy = (iy >> shift) << shift
        units = jnp.int32(1) << shift
        unit_len = self.root_side / (1 << morton.COORD_BITS)
        side = units.astype(self.root_side.dtype) * unit_len
        low = self.origin + jnp.stack([ix, iy], -1).astype(side.dtype) * unit_len
        return low + 0.5 * side[..., None], side


def _two_sum_combine(a, b):
    """Associative combine on (hi, lo) compensated-sum pairs.

    Knuth two-sum: the rounding error of ``hi = ah + bh`` is computed
    EXACTLY in f32 and pushed into ``lo``, so (hi, lo) tracks the exact
    sum to ~eps^2 relative. Associativity holds to the same order, which
    is all ``associative_scan`` needs.
    """
    ah, al = a
    bh, bl = b
    s = ah + bh
    z = s - ah
    err = (ah - (s - z)) + (bh - z)
    return s, (al + bl) + err


def _compensated_prefix(vals):
    """Inclusive compensated prefix sum along the last axis.

    Returns (hi, lo) with hi + lo ~= exact prefix. Used for node-range
    aggregate differences; see the module docstring for why plain f32
    cumsum is not enough.
    """
    zeros = jnp.zeros_like(vals)
    return jax.lax.associative_scan(_two_sum_combine, (vals, zeros), axis=-1)


@functools.partial(jax.jit, static_argnames=("num_nodes", "leaf_size",
                                              "max_depth"))
def build_tree(pos, mass_exert, alive, origin, root_side, *, num_nodes: int,
               leaf_size: int, max_depth: int) -> Tree:
    """Build the flat quadtree. ``mass_exert`` must be 0 for dead bodies."""
    cap = pos.shape[0]
    NC = num_nodes
    L = max_depth + 1
    dtype = pos.dtype
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(root_side, dtype)

    codes = morton.hilbert_codes(pos, origin, root_side, alive)
    order = jnp.argsort(codes, stable=True)
    scodes = codes[order]
    spos = pos[order]
    alive_sorted = alive[order]
    smass = jnp.where(alive_sorted, mass_exert[order], 0.0)
    unsort = jnp.argsort(order)  # orig index -> sorted slot (scatter-free)
    n_alive = jnp.sum(alive.astype(jnp.int32))

    body_idx = jnp.arange(cap, dtype=jnp.int32)
    body_alive = body_idx < n_alive

    # ---- pass 1: boundary analysis, ALL levels batched on (L, cap) ----
    shifts = jnp.asarray([2 * (morton.COORD_BITS - l) for l in range(L)],
                         jnp.int32)
    lvl_col = jnp.arange(L, dtype=jnp.int32)[:, None]
    prefix = scodes[None, :] >> shifts[:, None]                  # (L, cap)
    prev = jnp.concatenate(
        [jnp.full((L, 1), -1, jnp.int32), prefix[:, :-1]], axis=1)
    first = body_alive[None, :] & ((body_idx == 0) | (prefix != prev))
    start_lv = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, body_idx, 0), axis=1)
    nxt = jax.lax.associative_scan(
        jnp.minimum, jnp.where(first, body_idx, _BIG), axis=1, reverse=True)
    end_lv = jnp.minimum(
        jnp.concatenate([nxt[:, 1:], jnp.full((L, 1), _BIG, jnp.int32)],
                        axis=1), n_alive)
    count_lv = end_lv - start_lv
    internal = (count_lv > leaf_size) & (lvl_col < max_depth)
    # path-alive: every STRICT ancestor internal (exclusive cumulative AND
    # down the level axis, as a zero-count of non-internal ancestors)
    blocked = jnp.cumsum((~internal[:-1]).astype(jnp.int32), axis=0)
    blocked = jnp.concatenate(
        [jnp.zeros((1, cap), jnp.int32), blocked], axis=0)
    is_node = body_alive[None, :] & (blocked == 0)
    is_leaf = is_node & ~internal
    owner = first & is_node
    k_lv = jnp.cumsum(owner.astype(jnp.int32), axis=1)          # (L, cap)
    n_per = k_lv[:, -1]                                          # (L,)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_per)])         # (L+1,)
    node_need = cum[-1]
    n_nodes = jnp.minimum(node_need, NC)

    # ---- pass 2: slot-wise materialization (one searchsorted + gathers) --
    s = jnp.arange(NC, dtype=jnp.int32)
    lvl = jnp.clip(jnp.searchsorted(cum, s, side="right") - 1,
                   0, L - 1).astype(jnp.int32)
    slot_valid = s < n_nodes
    j = s - cum[lvl]
    # owner body: binary search the owner-rank cumsum of the slot's level.
    # Rows are made globally monotone by a per-level offset > max rank, so
    # ONE flattened searchsorted answers every slot at once.
    stride = jnp.int32(cap + 2)
    k_flat = (k_lv + (jnp.arange(L, dtype=jnp.int32) * stride)[:, None]
              ).reshape(L * cap)
    b = jnp.clip(jnp.searchsorted(k_flat, j + 1 + lvl * stride,
                                  side="left") - lvl * cap,
                 0, cap - 1).astype(jnp.int32)
    fi = lvl * cap + b

    def gat(arr2d, idx=None):
        return arr2d.reshape(L * cap)[fi if idx is None else idx]

    blk_start = jnp.where(slot_valid, gat(start_lv), 0)
    blk_count = jnp.where(slot_valid, gat(count_lv), 0)
    blk_end = jnp.where(slot_valid, gat(end_lv), 0)
    blk_leaf = gat(is_leaf) & slot_valid
    shift_s = 2 * (morton.COORD_BITS - lvl)
    blk_code = jnp.where(slot_valid, (scodes[b] >> shift_s) << shift_s, 0)
    # parent: rank of the owner's level-(l-1) cell; -1 for the root
    parent_fi = jnp.maximum(lvl - 1, 0) * cap + b
    blk_parent = jnp.where(slot_valid & (lvl > 0),
                           cum[jnp.maximum(lvl - 1, 0)] + gat(k_lv, parent_fi)
                           - 1, -1)
    # child: rank of the owner's level-(l+1) cell (the owner body is a
    # boundary at every deeper level); occupied-child count = child-level
    # owners within [start, end)
    lvl_c = jnp.minimum(lvl + 1, L - 1)
    child_fi = lvl_c * cap + b
    end_m1_fi = lvl_c * cap + jnp.clip(blk_end - 1, 0, cap - 1)
    has_child = slot_valid & ~blk_leaf & (lvl < max_depth)
    blk_child = jnp.where(has_child, cum[lvl_c] + gat(k_lv, child_fi) - 1, -1)
    blk_nc = jnp.where(has_child,
                       gat(k_lv, end_m1_fi) - gat(k_lv, child_fi) + 1, 0)
    # cell geometry from the owner body's integer grid coords masked to the
    # level (every body in the cell shares the cell's coordinate prefix) —
    # no Hilbert decode anywhere in the build.
    unit_len = root_side / (1 << morton.COORD_BITS)
    sij = morton.cell_coords(spos, origin, root_side)
    gshift = morton.COORD_BITS - lvl
    gx = (sij[b, 0] >> gshift) << gshift
    gy = (sij[b, 1] >> gshift) << gshift
    side_units = (jnp.int32(1) << gshift).astype(dtype)
    blk_side = jnp.where(slot_valid, side_units * unit_len, 0.0)
    blk_cx = jnp.where(slot_valid,
                       origin[0] + (gx.astype(dtype) + 0.5 * side_units)
                       * unit_len, 0.0)
    blk_cy = jnp.where(slot_valid,
                       origin[1] + (gy.astype(dtype) + 0.5 * side_units)
                       * unit_len, 0.0)
    level_t = jnp.where(slot_valid, lvl, 0)

    # ---- aggregates: compensated prefix-sum differences over [start, end) -
    w = jnp.where(body_alive, smass, 0.0)
    vals = jnp.stack([w, w * spos[:, 0], w * spos[:, 1]])        # (3, cap)
    hi, lo = _compensated_prefix(vals)
    zero3 = jnp.zeros((3, 1), vals.dtype)
    ehi = jnp.concatenate([zero3, hi], axis=1)                   # (3, cap+1)
    elo = jnp.concatenate([zero3, lo], axis=1)
    agg = ((ehi[:, blk_end] - ehi[:, blk_start])
           + (elo[:, blk_end] - elo[:, blk_start]))              # (3, NC)
    m_t, mx_t, my_t = agg[0], agg[1], agg[2]

    msafe = jnp.maximum(m_t, 1e-30)
    com = jnp.stack([mx_t / msafe, my_t / msafe], axis=-1)

    # Parent cell geometry from the owner body's coords masked one level
    # coarser (lvl - 1) — no gather, same trick as the node's own cell.
    pgshift = jnp.minimum(gshift + 1, morton.COORD_BITS)
    pgx = (sij[b, 0] >> pgshift) << pgshift
    pgy = (sij[b, 1] >> pgshift) << pgshift
    pside_units = (jnp.int32(1) << pgshift).astype(dtype)
    has_par = slot_valid & (lvl > 0)
    blk_pside = jnp.where(has_par, pside_units * unit_len, 0.0)
    blk_pcx = jnp.where(has_par,
                        origin[0] + (pgx.astype(dtype) + 0.5 * pside_units)
                        * unit_len, 0.0)
    blk_pcy = jnp.where(has_par,
                        origin[1] + (pgy.astype(dtype) + 0.5 * pside_units)
                        * unit_len, 0.0)

    f32 = lambda x: x.astype(jnp.float32)
    node_rows = jnp.stack(
        [f32(m_t), f32(com[:, 0]), f32(com[:, 1]), f32(blk_cx),
         f32(blk_cy), f32(blk_side), f32(blk_child),
         f32(blk_nc), f32(blk_start), f32(blk_count),
         f32(blk_pcx), f32(blk_pcy), f32(blk_pside),
         has_par.astype(jnp.float32)], axis=-1)
    body_rows = jnp.concatenate(
        [f32(spos), f32(smass)[:, None], jnp.zeros((cap, 1), jnp.float32)],
        axis=-1)

    return Tree(code=blk_code, level=level_t, start=blk_start,
                count=blk_count, child=blk_child,
                n_children=blk_nc, parent=blk_parent,
                mass=m_t, com=com, n_nodes=n_nodes, node_need=node_need,
                node_rows=node_rows, body_rows=body_rows, spos=spos,
                smass=smass, sidx=order.astype(jnp.int32),
                unsort=unsort.astype(jnp.int32), n_alive=n_alive,
                origin=origin, root_side=root_side)


def strict_parity_nudge(pos, alive, origin, root_side, *, rounds: int = 3):
    """Reference coincident-body epsilon nudge, as a masked position update.

    The reference's recursive insert, once the recursion reaches a quad with
    half-size ``h < 1e-3`` (only possible when >= 2 bodies collide all the
    way down to that depth), displaces the body being inserted by +-1e-3 per
    axis, sign decided by the LOW MANTISSA BIT of each coordinate — MUTATING
    simulation state during the tree build
    (``src/main/kotlin/BarnesHutAlg.kt:139-151``). TPU-native equivalent:
    bodies that share the first-``h < 1e-3``-level cell with another alive
    in-root body get the same deterministic displacement, applied as one
    masked vector update (the bit test uses the position dtype's own bit
    pattern — f32 here vs the reference's f64 Double.toBits).

    ``rounds``: the reference re-nudges on every deeper level while bodies
    keep colliding (each nudge changes the mantissa, so near-coincident
    bodies eventually diverge); each round here recomputes coincidence and
    bits after the previous displacement. Bodies with EXACTLY identical
    coordinates never separate (identical bits => identical nudges) — in the
    reference that case recurses without bound, so there is no finite
    behavior to match.

    Coincidence detection is sort-based (two stable argsorts give
    lexicographic (cellx, celly) order; equal adjacent cells mark both
    neighbors) — no scatters, dead/out-of-root bodies excluded exactly like
    the reference's out-of-root insert no-op (``BarnesHutAlg.kt:126``).
    """
    dtype = pos.dtype
    # first depth d with quad half-size root_half / 2^d < 1e-3; the quad's
    # cell side there is root_side / 2^d (in (1e-3, 2e-3]). root_side must
    # be a static Python number (it is config-derived everywhere).
    side_f = float(root_side)
    d = max(0, math.ceil(math.log2(0.5 * side_f / 1e-3)))
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(side_f, dtype)
    s = root_side / (1 << d)
    itype = jnp.int32 if dtype == jnp.float32 else jnp.int64
    eps = jnp.asarray(1e-3, dtype)

    for _ in range(rounds):
        inside = ((pos[:, 0] >= origin[0]) & (pos[:, 0] < origin[0] + root_side)
                  & (pos[:, 1] >= origin[1]) & (pos[:, 1] < origin[1] + root_side))
        ok = alive & inside
        q = jnp.floor((pos - origin) / s).astype(jnp.int32)
        q = jnp.where(ok[:, None], q, -1 - jnp.arange(
            pos.shape[0], dtype=jnp.int32)[:, None])  # unique cells for dead
        o1 = jnp.argsort(q[:, 1], stable=True)
        o2 = jnp.argsort(q[o1, 0], stable=True)
        order = o1[o2]
        qs = q[order]
        same = jnp.all(qs[1:] == qs[:-1], axis=1)
        pad = jnp.zeros((1,), bool)
        coinc_sorted = (jnp.concatenate([same, pad])
                        | jnp.concatenate([pad, same]))
        coinc = coinc_sorted[jnp.argsort(order)] & ok
        bx = jax.lax.bitcast_convert_type(pos[:, 0], itype)
        by = jax.lax.bitcast_convert_type(pos[:, 1], itype)
        dx = jnp.where((bx & 1) == 0, eps, -eps)
        dy = jnp.where((by & 1) == 0, -eps, eps)
        pos = pos + jnp.where(coinc[:, None],
                              jnp.stack([dx, dy], axis=-1), 0.0)
    return pos


def debug_boxes(tree: Tree):
    """(center (NC,2), side (NC,), valid (NC,)) for the D-key tree overlay.

    Equivalent of ``BHTree.visitQuads`` (``BarnesHutAlg.kt:265-274``) feeding
    ``NBodyPanel.paintComponent``'s quad outlines (``NBodyPanel.kt:327-344``).
    """
    ids = jnp.arange(tree.code.shape[0], dtype=jnp.int32)
    center, side = tree.cell_geometry(ids)
    return center, side, ids < tree.n_nodes
