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
2. Per level (static python loop, nothing inside ``lax.while``): boundary
   masks (``prefix[i] != prefix[i-1]``), per-body cell start/end via
   max/min prefix scans, and a "path-alive" mask that descends only through
   internal (count > leaf_size) cells. A cell is a node iff its parent is
   internal; it is a leaf iff small enough or at max depth. Only OCCUPIED
   children exist (1-4 per internal node, contiguous ids).
3. Node blocks per level are materialized with gather-based compaction
   (``searchsorted`` into the owner-rank cumsum — the inverse of a
   scatter) and written with ``dynamic_update_slice`` at the level offset.
   No XLA scatter ops appear anywhere in the build: scatters into carried
   buffers proved pathologically slow on TPU (sequential lowering), which
   sank a first scatter-based implementation of this build.
4. Aggregates: leaf mass/COM via one ``segment_sum`` over the body->leaf
   map, then a bottom-up per-level sweep summing each parent's <=4 children
   by gather — the vectorized ``computeMass`` (``BarnesHutAlg.kt:173-202``).

The root quad matches the reference sizing: centered at (W/2, H/2) with
half-side max(W, H)/2 + 2 (``BarnesHutAlg.kt:359-362``).
"""

from __future__ import annotations

import functools
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
    # [mass, comx, comy, cx, cy, side, child, nchild, start, count] as ONE
    # row-gather is ~10x cheaper than ten field gathers. Geometry (cx, cy,
    # side) is precomputed at build so the traversal never decodes codes.
    node_rows: jax.Array   # (NC, 10) float32
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


def _cummax(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _cummin_rev(x):
    return jax.lax.associative_scan(jnp.minimum, x, reverse=True)


@functools.partial(jax.jit, static_argnames=("num_nodes", "leaf_size",
                                              "max_depth"))
def build_tree(pos, mass_exert, alive, origin, root_side, *, num_nodes: int,
               leaf_size: int, max_depth: int) -> Tree:
    """Build the flat quadtree. ``mass_exert`` must be 0 for dead bodies."""
    cap = pos.shape[0]
    NC = num_nodes
    W = NC  # per-level block width cap (a level cannot exceed the table)
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

    # ---- pass 1: per-level boundary analysis over sorted bodies ----
    lv = []          # per level dict of (cap,) arrays
    path_alive = body_alive  # body's level-l cell is a node
    for l in range(max_depth + 1):
        shift = 2 * (morton.COORD_BITS - l)
        prefix = scodes >> shift
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prefix[:-1]])
        first = body_alive & ((body_idx == 0) | (prefix != prev))
        start_b = _cummax(jnp.where(first, body_idx, 0))
        nxt = _cummin_rev(jnp.where(first, body_idx, _BIG))
        end_b = jnp.minimum(
            jnp.concatenate([nxt[1:], jnp.full((1,), _BIG, jnp.int32)]),
            n_alive)
        count_b = end_b - start_b
        is_node = path_alive
        is_leaf = is_node & ((count_b <= leaf_size) | (l == max_depth))
        owner = first & is_node
        k = jnp.cumsum(owner.astype(jnp.int32))
        lv.append(dict(first=first, start=start_b, end=end_b, count=count_b,
                       is_node=is_node, is_leaf=is_leaf, k=k, n=k[-1],
                       shift=shift))
        path_alive = is_node & ~is_leaf

    # level offsets (traced scalars)
    offsets = [jnp.int32(0)]
    node_need = jnp.int32(0)
    for l in range(max_depth + 1):
        node_need = node_need + lv[l]["n"]
        offsets.append(jnp.minimum(offsets[-1] + lv[l]["n"], NC))
    n_nodes = offsets[-1]

    # ---- pass 2: materialize node blocks (gather-compaction + DUS) ----
    pad = NC + W
    code_t = jnp.zeros((pad,), jnp.int32)
    level_t = jnp.zeros((pad,), jnp.int32)
    start_t = jnp.zeros((pad,), jnp.int32)
    count_t = jnp.zeros((pad,), jnp.int32)
    child_t = jnp.full((pad,), -1, jnp.int32)
    nchild_t = jnp.zeros((pad,), jnp.int32)
    parent_t = jnp.full((pad,), -1, jnp.int32)
    cx_t = jnp.zeros((pad,), dtype)
    cy_t = jnp.zeros((pad,), dtype)
    side_t = jnp.zeros((pad,), dtype)
    unit_len = root_side / (1 << morton.COORD_BITS)

    j = jnp.arange(W, dtype=jnp.int32)
    for l in range(max_depth + 1):
        L = lv[l]
        n_l = L["n"]
        # owner body of the j-th level-l node (inverse of the owner cumsum)
        b = jnp.clip(jnp.searchsorted(L["k"], j + 1, side="left"),
                     0, cap - 1).astype(jnp.int32)
        valid = j < jnp.minimum(n_l, W)
        shift = L["shift"]
        blk_code = (scodes[b] >> shift) << shift
        blk_start = L["start"][b]
        blk_count = L["count"][b]
        blk_leaf = L["is_leaf"][b]
        if l > 0:
            P = lv[l - 1]
            blk_parent = offsets[l - 1] + P["k"][b] - 1
        else:
            blk_parent = jnp.full((W,), -1, jnp.int32)
        if l < max_depth:
            C = lv[l + 1]
            end_m1 = jnp.clip(L["end"][b] - 1, 0, cap - 1)
            blk_child = offsets[l + 1] + C["k"][b] - 1
            blk_nc = C["k"][end_m1] - C["k"][b] + 1
        else:
            blk_child = jnp.full((W,), -1, jnp.int32)
            blk_nc = jnp.zeros((W,), jnp.int32)
        blk_child = jnp.where(blk_leaf, -1, blk_child)
        blk_nc = jnp.where(blk_leaf, 0, blk_nc)

        # cell geometry, precomputed once per node (decode + level mask)
        gx, gy = morton.hilbert2d_inverse(blk_code)
        gshift = morton.COORD_BITS - l
        gx = (gx >> gshift) << gshift
        gy = (gy >> gshift) << gshift
        side_l = float(1 << gshift)
        blk_cx = origin[0] + (gx.astype(dtype) + 0.5 * side_l) * unit_len
        blk_cy = origin[1] + (gy.astype(dtype) + 0.5 * side_l) * unit_len

        off = offsets[l]

        def dus(table, blk, fill_invalid):
            blk = jnp.where(valid, blk, fill_invalid)
            # Region beyond n_l holds junk that the NEXT level's write
            # overwrites; the table is padded by W so the write never clamps.
            return jax.lax.dynamic_update_slice(table, blk, (off,))

        code_t = dus(code_t, blk_code, 0)
        level_t = dus(level_t, jnp.full((W,), l, jnp.int32), 0)
        start_t = dus(start_t, blk_start, 0)
        count_t = dus(count_t, blk_count, 0)
        child_t = dus(child_t, blk_child, -1)
        nchild_t = dus(nchild_t, blk_nc, 0)
        parent_t = dus(parent_t, blk_parent, -1)
        cx_t = dus(cx_t, blk_cx, 0.0)
        cy_t = dus(cy_t, blk_cy, 0.0)
        side_t = dus(side_t, jnp.full((W,), side_l * unit_len, dtype), 0.0)

    # ---- aggregates: leaf sums + bottom-up child gathers ----
    leaf_id = jnp.full((cap,), NC, jnp.int32)
    for l in range(max_depth + 1):
        L = lv[l]
        lid = offsets[l] + L["k"] - 1
        leaf_id = jnp.where(L["is_leaf"] & body_alive, lid, leaf_id)
    w = jnp.where(body_alive, smass, 0.0)
    seg = jnp.clip(leaf_id, 0, NC + W)
    m_t = jax.ops.segment_sum(w, seg, num_segments=pad + 1)[:pad]
    mx_t = jax.ops.segment_sum(w * spos[:, 0], seg, num_segments=pad + 1)[:pad]
    my_t = jax.ops.segment_sum(w * spos[:, 1], seg, num_segments=pad + 1)[:pad]

    for l in range(max_depth - 1, -1, -1):
        off = offsets[l]
        blk_child = jax.lax.dynamic_slice(child_t, (off,), (W,))
        blk_nc = jax.lax.dynamic_slice(nchild_t, (off,), (W,))
        blk_m = jax.lax.dynamic_slice(m_t, (off,), (W,))
        blk_mx = jax.lax.dynamic_slice(mx_t, (off,), (W,))
        blk_my = jax.lax.dynamic_slice(my_t, (off,), (W,))
        valid = j < (offsets[l + 1] - off)
        for c in range(4):
            idx = jnp.clip(blk_child + c, 0, pad - 1)
            take = valid & (c < blk_nc) & (blk_child >= 0)
            blk_m = blk_m + jnp.where(take, m_t[idx], 0.0)
            blk_mx = blk_mx + jnp.where(take, mx_t[idx], 0.0)
            blk_my = blk_my + jnp.where(take, my_t[idx], 0.0)
        m_t = jax.lax.dynamic_update_slice(m_t, blk_m, (off,))
        mx_t = jax.lax.dynamic_update_slice(mx_t, blk_mx, (off,))
        my_t = jax.lax.dynamic_update_slice(my_t, blk_my, (off,))

    msafe = jnp.maximum(m_t[:NC], 1e-30)
    com = jnp.stack([mx_t[:NC] / msafe, my_t[:NC] / msafe], axis=-1)

    f32 = lambda x: x.astype(jnp.float32)
    node_rows = jnp.stack(
        [f32(m_t[:NC]), f32(com[:, 0]), f32(com[:, 1]), f32(cx_t[:NC]),
         f32(cy_t[:NC]), f32(side_t[:NC]), f32(child_t[:NC]),
         f32(nchild_t[:NC]), f32(start_t[:NC]), f32(count_t[:NC])], axis=-1)
    body_rows = jnp.concatenate(
        [f32(spos), f32(smass)[:, None], jnp.zeros((cap, 1), jnp.float32)],
        axis=-1)

    return Tree(code=code_t[:NC], level=level_t[:NC], start=start_t[:NC],
                count=count_t[:NC], child=child_t[:NC],
                n_children=nchild_t[:NC], parent=parent_t[:NC],
                mass=m_t[:NC], com=com, n_nodes=n_nodes, node_need=node_need,
                node_rows=node_rows, body_rows=body_rows, spos=spos,
                smass=smass, sidx=order.astype(jnp.int32),
                unsort=unsort.astype(jnp.int32), n_alive=n_alive,
                origin=origin, root_side=root_side)


def debug_boxes(tree: Tree):
    """(center (NC,2), side (NC,), valid (NC,)) for the D-key tree overlay.

    Equivalent of ``BHTree.visitQuads`` (``BarnesHutAlg.kt:265-274``) feeding
    ``NBodyPanel.paintComponent``'s quad outlines (``NBodyPanel.kt:327-344``).
    """
    ids = jnp.arange(tree.code.shape[0], dtype=jnp.int32)
    center, side = tree.cell_geometry(ids)
    return center, side, ids < tree.n_nodes
