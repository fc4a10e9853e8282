"""Vectorized Barnes-Hut MAC traversal + blocked force evaluation.

Replaces the reference's per-body recursive traversal
(``BHTree.accumulateForce``, ``src/main/kotlin/BarnesHutAlg.kt:215-239``)
with a TPU-shaped scheme:

* Bodies are grouped by TREE NODE: a group is a maximal node holding at most
  ``group_size`` bodies (its parent holds more). Groups partition the
  Hilbert-sorted body array into contiguous ranges AND are spatially compact
  squares by construction. The group MAC box is the tight AABB of the
  group's members.

* Each group runs a breadth-first wave traversal over the flat tree: all
  groups advance in lockstep (vmapped waves, statically unrolled — no
  ``lax.while`` wrapping, which XLA lowers poorly around gather/scatter
  compositions on TPU). Per wave the whole frontier is tested at once
  against the group box with the conservative group MAC:

      accept node  <=>  s^2 < theta^2 * (d_box^2 + eps^2)  and  d_box > 0

  where s is the node cell side and d_box the min distance from the node's
  cell box to the group box. Every body in the group is inside the group box
  and the node's COM is inside its cell, so d_box <= d_com: every accepted
  interaction also satisfies the reference's per-body criterion
  s^2 < theta^2 * (d_com^2 + eps^2) (``BarnesHutAlg.kt:225-228`` — note the
  softening inside the criterion distance, reproduced here). The extra
  ``d_box > 0`` keeps a group's own (and touching) cells opened so
  self-interaction is excluded exactly, like the ``single === b`` identity
  check (``BarnesHutAlg.kt:219``).

* Accepted nodes append to a per-group approx (multipole) list; rejected
  leaves append to a direct list whose body ranges are flattened into a
  padded partner array; rejected internal nodes push their 1-4 occupied
  children into the next frontier via gather-based expansion (searchsorted
  over the child-count cumsum — the inverse of a scatter). All lists are
  fixed-capacity; per-group *needed* sizes are returned so the engine can
  re-derive caps on overflow instead of silently dropping interactions.

* Force evaluation is dense and blocked: (group_size x approx_cap) and
  (group_size x direct_cap) pair blocks with the reference point-mass kernel
  a += m_src * d * r^-3, r^2 = |d|^2 + eps^2 (``BarnesHutAlg.kt:250-259``).
  Self-pairs and padding contribute exactly zero (d = 0 / mass = 0). Groups
  stream through ``lax.map`` chunks to bound working-set memory; the chunked
  body is pure gather + arithmetic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_nbody.ops.tree import Tree


class TraversalStats(NamedTuple):
    """Max per-group list sizes actually needed (for cap auto-tuning)."""
    approx_need: jax.Array
    leaf_need: jax.Array
    direct_need: jax.Array
    frontier_need: jax.Array
    group_need: jax.Array       # number of groups actually formed
    node_need: jax.Array        # tree nodes the scene requires (> num_nodes
                                # means the build truncated deep levels)
    group_size_need: jax.Array  # max bodies in any LEAF: a childless node
                                # bigger than group_size can't join any group
                                # and its bodies would get zero force, so
                                # coverage requires group_size >= this
    # hier traversal only: (n_levels,) max per-chunk candidate-set size at
    # each refinement level; None for the dense/bfs traversals.
    cand_need: jax.Array | None = None

    def overflowed(self, caps) -> jax.Array:
        out = ((self.approx_need > caps["approx_cap"])
               | (self.leaf_need > caps["leaf_list_cap"])
               | (self.direct_need > caps["direct_body_cap"])
               | (self.frontier_need > caps["frontier_cap"])
               | (self.group_need > caps["group_cap"])
               | (self.node_need > caps["num_nodes"])
               | (self.group_size_need > caps["group_size"]))
        cc = caps.get("cand_caps") if hasattr(caps, "get") else None
        if cc is not None and self.cand_need is not None:
            n = min(len(cc), int(self.cand_need.shape[0]))
            if n:
                out = out | jnp.any(self.cand_need[:n]
                                    > jnp.asarray(cc[:n], jnp.int32))
        return out


def make_groups(tree: Tree, group_size: int, group_cap: int):
    """Traversal groups = maximal small tree nodes (<= group_size bodies,
    parent bigger; the root qualifies when small). Returns group body ranges
    sorted by start, so groups tile the sorted body array in order."""
    NC = tree.code.shape[0]
    cap = tree.spos.shape[0]
    ids = jnp.arange(NC, dtype=jnp.int32)
    valid = ids < tree.n_nodes
    pcnt = jnp.where(tree.parent >= 0, tree.count[jnp.maximum(tree.parent, 0)],
                     jnp.iinfo(jnp.int32).max)
    is_group = valid & (tree.count > 0) & (tree.count <= group_size) \
        & (pcnt > group_size)
    n_groups = jnp.sum(is_group.astype(jnp.int32))

    start_key = jnp.where(is_group, tree.start, cap + 1)
    order = jnp.argsort(start_key)[:group_cap]
    gvalid = is_group[order]
    gstart = jnp.where(gvalid, tree.start[order], cap)
    gcount = jnp.where(gvalid, tree.count[order], 0)
    return gvalid, gstart, gcount, n_groups


def _traverse_all(tree: Tree, gmin, gmax, gvalid, theta2, soft2, *,
                  max_depth, frontier_cap, approx_cap, leaf_list_cap):
    """Lockstep BFS over all groups. gmin/gmax: (G, 2). Returns per-group
    approx/leaf index lists + needed sizes. Waves are python-unrolled."""
    G = gvalid.shape[0]
    F, A, L = frontier_cap, approx_cap, leaf_list_cap
    slot = jnp.arange(F, dtype=jnp.int32)[None, :]          # (1, F)

    frontier = jnp.zeros((G, F), jnp.int32)
    f_len = jnp.where(gvalid, 1, 0).astype(jnp.int32)       # (G,)
    approx = jnp.zeros((G, A), jnp.int32)
    a_len = jnp.zeros((G,), jnp.int32)
    leaves = jnp.zeros((G, L), jnp.int32)
    l_len = jnp.zeros((G,), jnp.int32)
    f_need = f_len

    def append(buf, length, take, values, cap_):
        # (G, F) take/values -> compacted append at per-group offsets.
        pos = length[:, None] + jnp.cumsum(take.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(take & (pos < cap_), pos, cap_)
        buf = jax.vmap(lambda b, t, v: b.at[t].set(v, mode="drop"))(
            buf, tgt, values)
        return buf, length + jnp.sum(take.astype(jnp.int32), axis=1)

    for _ in range(max_depth + 1):
        active = slot < f_len[:, None]                       # (G, F)
        nid = jnp.where(active, frontier, 0)
        # ONE packed row-gather per frontier node (see Tree.node_rows).
        rows = tree.node_rows[nid]                           # (G, F, 10)
        nonempty = active & (rows[..., 0] > 0)
        cx, cy, side = rows[..., 3], rows[..., 4], rows[..., 5]
        half = 0.5 * side
        gapx = jnp.maximum(0.0, jnp.maximum((cx - half) - gmax[:, None, 0],
                                            gmin[:, None, 0] - (cx + half)))
        gapy = jnp.maximum(0.0, jnp.maximum((cy - half) - gmax[:, None, 1],
                                            gmin[:, None, 1] - (cy + half)))
        d2 = gapx * gapx + gapy * gapy
        accept = (side * side < theta2 * (d2 + soft2)) & (d2 > 0)
        is_leaf = rows[..., 6] < 0

        take_a = nonempty & accept
        take_l = nonempty & ~accept & is_leaf
        take_o = nonempty & ~accept & ~is_leaf

        approx, a_len = append(approx, a_len, take_a, nid, A)
        leaves, l_len = append(leaves, l_len, take_l, nid, L)

        # Frontier expansion: opened nodes contribute their 1-4 occupied
        # children, compacted at exclusive-cumsum positions with 4 bounded
        # scatters (cheaper here than a per-wave searchsorted inversion).
        # Child ids come from the already-gathered rows.
        nc = jnp.where(take_o, rows[..., 7].astype(jnp.int32), 0)
        cum = jnp.cumsum(nc, axis=1)
        total = cum[:, -1]
        o_pos = cum - nc                                     # exclusive cumsum
        child0 = rows[..., 6].astype(jnp.int32)
        nxt = jnp.zeros((approx.shape[0], F), jnp.int32)
        for c in range(4):
            tgt = jnp.where(take_o & (c < nc) & (o_pos + c < F),
                            o_pos + c, F)
            nxt = jax.vmap(lambda b, t, v: b.at[t].set(v, mode="drop"))(
                nxt, tgt, child0 + c)
        f_need = jnp.maximum(f_need, total)
        f_len = jnp.minimum(total, F)
        frontier = jnp.where(slot < f_len[:, None], nxt, 0)

    return approx, a_len, leaves, l_len, f_need


def _box_pass(gmin, gmax, cx, cy, half, side2, theta2, soft2):
    """Group-MAC pass mask for (G,) group boxes x (NC,) node cells.

    pass <=> s^2 < theta^2 * (gap^2 + eps^2)  and  gap > 0, with gap the
    min distance between the group AABB and the node's cell box — the same
    conservative form the wave traversal uses (every body is inside the
    group box and the node COM inside its cell, so any accepted pair also
    satisfies the reference per-body MAC ``BarnesHutAlg.kt:225-228``).
    """
    gapx = jnp.maximum(0.0, jnp.maximum((cx - half)[None, :] - gmax[:, 0:1],
                                        gmin[:, 0:1] - (cx + half)[None, :]))
    gapy = jnp.maximum(0.0, jnp.maximum((cy - half)[None, :] - gmax[:, 1:2],
                                        gmin[:, 1:2] - (cy + half)[None, :]))
    d2 = gapx * gapx + gapy * gapy
    return (side2[None, :] < theta2 * (d2 + soft2)) & (d2 > 0)


def _compact_rows(mask, cap_, *, use_topk: bool):
    """Per-row indices of set bits, compacted left and padded with 0.

    mask (G, NC) -> (idx (G, cap_) int32, len (G,) clipped, total (G,) exact).
    Two interchangeable lowerings for this backend: ``top_k`` on a
    descending-id score (one fused partial sort) or cumsum + vmapped binary
    search (the tree build's owner-compaction trick). Selected statically;
    both return ids in ascending order.
    """
    G, NC = mask.shape
    total = jnp.sum(mask.astype(jnp.int32), axis=1)
    k = min(cap_, NC)
    if use_topk:
        ids = jnp.arange(NC, dtype=jnp.int32)
        score = jnp.where(mask, NC - ids, 0)
        val, idx = jax.lax.top_k(score, k)
        idx = jnp.where(val > 0, idx, 0).astype(jnp.int32)
    else:
        kk = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        j = jnp.arange(k, dtype=jnp.int32)
        idx = jax.vmap(
            lambda row: jnp.searchsorted(row, j + 1, side="left"))(kk)
        idx = jnp.clip(idx, 0, NC - 1).astype(jnp.int32)
        idx = jnp.where(j[None, :] < jnp.minimum(total, k)[:, None], idx, 0)
    if k < cap_:
        idx = jnp.pad(idx, ((0, 0), (0, cap_ - k)))
    return idx, jnp.minimum(total, cap_), total


def _classify_dense(tree: Tree, gmin, gmax, gvalid, theta2, soft2, *,
                    approx_cap, leaf_list_cap, use_topk: bool = True):
    """Dense local MAC classification — the BFS-free traversal.

    The conservative group MAC is monotone down the tree: a node's children
    have half its cell side and at-least-its box gap, so ``pass(parent)``
    implies ``pass(child)`` (and contrapositively ``!pass(parent)`` implies
    no ancestor passed). A wave traversal therefore carries no information a
    local test can't reconstruct:

        accepted multipole  <=>  pass(n) and not pass(parent(n))
        direct leaf         <=>  leaf(n) and not pass(n)

    which turns the traversal into ONE dense (groups x nodes) mask
    computation — pure broadcast arithmetic at VPU rates, no frontier row
    gathers, no per-wave list appends (the round-2 BH profile's dominant
    cost) — followed by one compaction per list. Returns the same
    (approx, a_len, leaves, l_len, needs) the wave traversal produced, with
    *exact* needs (the wave version could only lower-bound them past a
    truncated frontier).
    """
    rows = tree.node_rows
    NC = rows.shape[0]
    node_valid = jnp.arange(NC, dtype=jnp.int32) < tree.n_nodes
    occupied = node_valid & (rows[:, 0] > 0)
    cx, cy, side = rows[:, 3], rows[:, 4], rows[:, 5]
    is_leaf = rows[:, 6] < 0
    par = tree.parent
    has_parent = par >= 0
    psafe = jnp.maximum(par, 0)
    pcx, pcy, pside = cx[psafe], cy[psafe], side[psafe]

    pass_n = _box_pass(gmin, gmax, cx, cy, 0.5 * side, side * side,
                       theta2, soft2)
    pass_p = _box_pass(gmin, gmax, pcx, pcy, 0.5 * pside, pside * pside,
                       theta2, soft2) & has_parent[None, :]
    live = occupied[None, :] & gvalid[:, None]
    accept = live & pass_n & ~pass_p
    direct = live & is_leaf[None, :] & ~pass_n

    approx, a_len, a_tot = _compact_rows(accept, approx_cap,
                                         use_topk=use_topk)
    leaves, l_len, l_tot = _compact_rows(direct, leaf_list_cap,
                                         use_topk=use_topk)
    return approx, a_len, leaves, l_len, a_tot, l_tot


def _direct_partners_all(tree: Tree, leaves, l_len, *, direct_body_cap,
                         chunk: int = 64):
    """Flatten per-group leaf body ranges into padded partner-slot arrays.

    Slot j of group g belongs to the leaf whose cumulative-count interval
    [offs_excl, offs) contains j, and maps to body ``lstart + (j -
    offs_excl)``. Instead of inverting the cumsum with a vmapped
    ``searchsorted`` + ``take_along_axis`` (measured ~150 ms of the 228 ms
    N=100k force pass — the dominant cost of the whole solver), the
    interval membership is evaluated DENSELY: an (L x DB) mask per group,
    reduced with the per-leaf offset ``lstart - offs_excl``. Pure broadcast
    compares + one masked sum at VPU rates (~350M lane-ops at bench shapes,
    single-digit ms), chunked over groups to bound the mask working set.
    """
    G, L = leaves.shape
    DB = direct_body_cap
    lvalid = jnp.arange(L, dtype=jnp.int32)[None, :] < l_len[:, None]
    lidx = jnp.where(lvalid, leaves, 0)
    lrows = tree.node_rows[lidx]                              # (G, L, 10)
    lstart = lrows[..., 8].astype(jnp.int32)
    counts = jnp.where(lvalid, lrows[..., 9].astype(jnp.int32), 0)
    offs = jnp.cumsum(counts, axis=1)
    total = offs[:, -1]
    jj = jnp.arange(DB, dtype=jnp.int32)

    c = min(chunk, G)
    n_chunks = -(-G // c)
    pad = n_chunks * c - G

    def pad_g(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad, L), jnp.int32)]) if pad else x

    def chunk_fn(args):
        oi, oe, ls = args                                     # (c, L)
        m = ((oe[:, :, None] <= jj[None, None, :])
             & (jj[None, None, :] < oi[:, :, None]))          # (c, L, DB)
        return jnp.sum(jnp.where(m, (ls - oe)[:, :, None], 0), axis=1)

    packed = jax.tree.map(lambda x: pad_g(x).reshape(n_chunks, c, L),
                          (offs, offs - counts, lstart))
    slots = jax.lax.map(chunk_fn, packed).reshape(-1, DB)[:G] + jj[None, :]
    valid = jj[None, :] < jnp.minimum(total, DB)[:, None]
    return jnp.where(valid, slots, 0), valid, total


def _box_pass_cols(bmn, bmx, cx, cy, side, theta2, soft2):
    """Conservative group-MAC pass, broadcast form.

    ``bmn``/``bmx`` are (..., 2) box corners; ``cx``/``cy``/``side`` are
    (..., K) cell geometry with broadcast-compatible leading dims. Same
    criterion as :func:`_box_pass` (softening inside the distance, gap > 0
    keeps touching cells open).
    """
    half = 0.5 * side
    gapx = jnp.maximum(0.0, jnp.maximum((cx - half) - bmx[..., 0:1],
                                        bmn[..., 0:1] - (cx + half)))
    gapy = jnp.maximum(0.0, jnp.maximum((cy - half) - bmx[..., 1:2],
                                        bmn[..., 1:2] - (cy + half)))
    d2 = gapx * gapx + gapy * gapy
    return (side * side < theta2 * (d2 + soft2)) & (d2 > 0)


def _hier_lists(tree: Tree, gmin, gmax, theta2, soft2, *, g_pad: int,
                sizes, kcaps):
    """Multi-level chunk candidate refinement (the hier traversal's core).

    The conservative group MAC is monotone in the BOX as well as down the
    tree: shrinking the query box can only grow the box-to-cell gap, so
    ``pass(chunk) => pass(any sub-box)``. Contrapositively, a node can be
    *accepted* by some group g (``pass_g(n) & ~pass_g(parent)``) or taken
    *direct* (``~pass_g(n)``) only if ``~pass_c(parent(n))`` for EVERY
    enclosing chunk box c — i.e. only candidates

        cand_c = { n occupied : n is root  or  ~pass_c(parent(n)) }

    can matter to any group inside c. The refinement runs this rule at a
    cascade of chunk granularities (``sizes`` groups per chunk, descending,
    each dividing the previous), compacting the per-chunk candidate set at
    each level — so no compaction ever runs over the full node table times
    the full group count (the dense classification's O(G x NC) sort, which
    is what sinks it at N=1M), and no per-wave appends happen at group
    granularity (the BFS path's scatter floor). Returns the FINAL level's
    candidate ids/rows/validity, chunk count, and per-level exact needs.
    """
    rows_all = tree.node_rows
    NC = rows_all.shape[0]
    node_occ = (jnp.arange(NC, dtype=jnp.int32) < tree.n_nodes) \
        & (rows_all[:, 0] > 0)

    ids = valid = None
    C_prev = 1
    needs = []
    for li, (sz, kcap) in enumerate(zip(sizes, kcaps)):
        C = g_pad // sz
        bmn = jnp.min(gmin.reshape(C, sz, 2), axis=1)
        bmx = jnp.max(gmax.reshape(C, sz, 2), axis=1)
        if ids is None:
            # vs the full node table; row-chunked to bound the mask
            batch = max(1, min(C, (1 << 25) // NC))
            masks = []
            for c0 in range(0, C, batch):
                b0, b1 = bmn[c0:c0 + batch], bmx[c0:c0 + batch]
                pp = _box_pass_cols(b0, b1, rows_all[None, :, 10],
                                    rows_all[None, :, 11],
                                    rows_all[None, :, 12], theta2, soft2)
                masks.append(node_occ[None, :]
                             & ((rows_all[None, :, 13] == 0.0) | ~pp))
            m = jnp.concatenate(masks, axis=0)                # (C, NC)
            idx, length, total = _compact_rows(m, kcap, use_topk=True)
            ids = idx
        else:
            r = C // C_prev
            crows = rows_all[jnp.where(valid, ids, 0)]        # (Cp, Kp, 14)
            occ = valid & (crows[..., 0] > 0)
            pp = _box_pass_cols(bmn.reshape(C_prev, r, 2),
                                bmx.reshape(C_prev, r, 2),
                                crows[..., 10][:, None, :],
                                crows[..., 11][:, None, :],
                                crows[..., 12][:, None, :], theta2, soft2)
            m = occ[:, None, :] & ((crows[..., 13] == 0.0)[:, None, :]
                                   | ~pp)                     # (Cp, r, Kp)
            idx, length, total = _compact_rows(
                m.reshape(C, ids.shape[1]), kcap, use_topk=True)
            ids = jnp.take_along_axis(jnp.repeat(ids, r, axis=0), idx,
                                      axis=1)
        valid = jnp.arange(kcap, dtype=jnp.int32)[None, :] < length[:, None]
        needs.append(jnp.max(total))
        C_prev = C

    crows = rows_all[jnp.where(valid, ids, 0)]                # (C, K, 14)
    return crows, valid, C_prev, needs


def _hier_accel(tree: Tree, gstart, gcount, gvalid, gmin, gmax, theta2,
                soft2, *, group_size: int, hier_sizes, cand_caps,
                leaf_list_cap: int, direct_body_cap: int, hier_batch: int,
                debug_stage: str = "full"):
    """Masked-dense BH force evaluation over hierarchical chunk candidates.

    Per final-level chunk (``hier_sizes[-1]`` adjacent groups) the member
    groups SHARE one candidate list; per-group accept/direct decisions are
    dense masks over it (``accept = pass_g(n) & ~pass_g(parent)``,
    ``direct = leaf & ~pass_g(n)`` — the same local monotone-MAC tests as
    :func:`_classify_dense`, so the interaction SETS are identical), and
    the force evaluation consumes the masks as per-group WEIGHTS on dense
    (group_size x K) pair blocks — dense pair math is the one primitive
    this backend runs at speed-of-light, and it replaces the per-group
    list compaction (a huge sort) entirely. Direct leaves are compacted
    once per CHUNK; their body ranges flatten through the dense
    interval-membership trick, and the per-(group, partner-slot) weights
    come from one batched matmul against the (one-hot) membership matrix.

    Returns (acc_rows (G, group_size, 2), needs dict).
    """
    cap, _ = tree.spos.shape
    G = gvalid.shape[0]
    NC = tree.node_rows.shape[0]
    GS = group_size
    LC, DB = leaf_list_cap, direct_body_cap

    # Effective refinement levels: strictly descending sizes below G, with
    # per-level candidate caps clipped to the node table. ``lvl_map`` keeps
    # the configured index of each effective level so the reported needs
    # line up with the configured cand_caps for retuning.
    sizes, kcaps, lvl_map = [], [], []
    for i, (s, c) in enumerate(zip(hier_sizes, cand_caps)):
        if s < G and (not sizes or (s < sizes[-1] and sizes[-1] % s == 0)):
            sizes.append(int(s))
            kcaps.append(min(int(c), NC))
            lvl_map.append(i)
    if not sizes:
        sizes = [G]
        kcaps = [min(int(cand_caps[-1]), NC)]
        lvl_map = [len(hier_sizes) - 1]
    CH = sizes[-1]
    g_pad = -(-G // sizes[0]) * sizes[0]

    def padg(x, fill):
        if g_pad == G:
            return x
        return jnp.concatenate(
            [x, jnp.full((g_pad - G,) + x.shape[1:], fill, x.dtype)])

    big = jnp.asarray(jnp.finfo(gmin.dtype).max, gmin.dtype)
    gminp = padg(gmin, big)
    gmaxp = padg(gmax, -big)
    gvp = padg(gvalid, False)
    gsp = padg(gstart, cap)
    gcp = padg(gcount, 0)

    crows, cvalid, C, lvl_needs = _hier_lists(
        tree, gminp, gmaxp, theta2, soft2, g_pad=g_pad, sizes=sizes,
        kcaps=kcaps)
    K = crows.shape[1]
    occ = cvalid & (crows[..., 0] > 0)                        # (C, K)

    # ---- per-group accept weights over the shared candidates ----
    bmn = gminp.reshape(C, CH, 2)
    bmx = gmaxp.reshape(C, CH, 2)
    gv = gvp.reshape(C, CH)
    pn = _box_pass_cols(bmn, bmx, crows[..., 3][:, None, :],
                        crows[..., 4][:, None, :],
                        crows[..., 5][:, None, :], theta2, soft2)
    pp = _box_pass_cols(bmn, bmx, crows[..., 10][:, None, :],
                        crows[..., 11][:, None, :],
                        crows[..., 12][:, None, :], theta2, soft2) \
        & (crows[..., 13] != 0.0)[:, None, :]
    accept = occ[:, None, :] & gv[..., None] & pn & ~pp       # (C, CH, K)
    wapx = jnp.where(accept, crows[..., 0][:, None, :], 0.0)

    # ---- chunk-level direct leaf list + flattened body partners ----
    is_leaf = crows[..., 6] < 0
    cmn = jnp.min(bmn, axis=1)
    cmx = jnp.max(bmx, axis=1)
    pcn = _box_pass_cols(cmn, cmx, crows[..., 3], crows[..., 4],
                         crows[..., 5], theta2, soft2)        # (C, K)
    dleaf = occ & is_leaf & ~pcn
    lidx, llen, ltot = _compact_rows(dleaf, LC, use_topk=True)
    lrows = jnp.take_along_axis(crows, lidx[..., None], axis=1)
    lvalid = jnp.arange(LC, dtype=jnp.int32)[None, :] < llen[:, None]
    lstart = lrows[..., 8].astype(jnp.int32)
    lcount = jnp.where(lvalid, lrows[..., 9].astype(jnp.int32), 0)
    offs = jnp.cumsum(lcount, axis=1)
    d_tot = offs[:, -1]
    # per-(group, leaf) direct mask, recomputed on the compacted leaf rows
    pnl = _box_pass_cols(bmn, bmx, lrows[..., 3][:, None, :],
                         lrows[..., 4][:, None, :],
                         lrows[..., 5][:, None, :], theta2, soft2)
    dmask = (lvalid & (lrows[..., 0] > 0))[:, None, :] & gv[..., None] \
        & ~pnl                                                # (C, CH, LC)

    if debug_stage == "classify":
        probe = (jnp.sum(wapx) + jnp.sum(dmask) + jnp.sum(lstart)
                 ).astype(jnp.float32)
        return probe, None

    # ---- chunk-batched flatten + masked-dense force evaluation ----
    spos = tree.spos
    body_rows = tree.body_rows
    Cb = max(1, min(hier_batch, C))
    n_batches = -(-C // Cb)
    c_pad = n_batches * Cb

    def padc(x, fill):
        if c_pad == C:
            return x
        return jnp.concatenate(
            [x, jnp.full((c_pad - C,) + x.shape[1:], fill, x.dtype)])

    jj = jnp.arange(DB, dtype=jnp.int32)

    def flat_batch(args):
        offs_b, cnt_b, ls_b, dm_b, dt_b = args
        oe = offs_b - cnt_b                                   # (Cb, LC)
        member = ((oe[:, :, None] <= jj[None, None, :])
                  & (jj[None, None, :] < offs_b[:, :, None])
                  ).astype(jnp.float32)                       # (Cb, LC, DB)
        # one batched matmul: row 0 = slot offsets, rows 1.. = group masks
        lhs = jnp.concatenate(
            [(ls_b - oe).astype(jnp.float32)[:, None, :],
             dm_b.astype(jnp.float32)], axis=1)               # (Cb, CH+1, LC)
        out = jax.lax.batch_matmul(lhs, member)               # (Cb, CH+1, DB)
        slots = out[:, 0, :].astype(jnp.int32) + jj[None, :]
        svalid = jj[None, :] < jnp.minimum(dt_b, DB)[:, None]
        wdir = out[:, 1:, :] * svalid[:, None, :]             # (Cb, CH, DB)
        prow = body_rows[jnp.where(svalid, slots, 0)]         # (Cb, DB, 4)
        return prow, wdir

    flat_args = jax.tree.map(
        lambda x: x.reshape((n_batches, Cb) + x.shape[1:]),
        (padc(offs, 0), padc(lcount, 0), padc(lstart, 0),
         padc(dmask, False), padc(d_tot, 0)))
    prow_b, wdir_b = jax.lax.map(flat_batch, flat_args)
    prow = prow_b.reshape(c_pad, DB, 4)
    wdir = wdir_b.reshape(c_pad, CH, DB)

    eb = max(1, min(4 * hier_batch, c_pad))
    while c_pad % eb:
        eb //= 2
    n_eb = c_pad // eb

    def eval_batch(args):
        gs_b, gv_b, wapx_b, com_b, prow_b2, wdir_b2 = args

        def one_chunk(gs_c, gv_c, wapx_c, com_c, prow_c, wdir_c):
            def one_g(gs_g, gv_g, wa_g, wd_g):
                sl0 = jnp.clip(gs_g, 0, cap - GS)
                bpos = jax.lax.dynamic_slice_in_dim(spos, sl0, GS, 0)
                acc = _point_accel(bpos, com_c, wa_g, soft2)
                acc = acc + _point_accel(bpos, prow_c[:, 0:2],
                                         prow_c[:, 2] * wd_g, soft2)
                return jnp.where(gv_g, 1.0, 0.0) * acc
            return jax.vmap(one_g)(gs_c, gv_c, wapx_c, wdir_c)
        return jax.vmap(one_chunk)(gs_b, gv_b, wapx_b, com_b, prow_b2,
                                   wdir_b2)

    eval_args = jax.tree.map(
        lambda x: x.reshape((n_eb, eb) + x.shape[1:]),
        (padc(gsp.reshape(C, CH), cap), padc(gv, False),
         padc(wapx, 0.0), padc(crows[..., 1:3], 0.0), prow, wdir))
    acc_b = jax.lax.map(eval_batch, eval_args)
    acc_rows = acc_b.reshape(c_pad * CH, GS, 2)[:G]

    n_levels = len(hier_sizes)
    cand_need = jnp.zeros((n_levels,), jnp.int32)
    for li, n in zip(lvl_map, lvl_needs):
        cand_need = cand_need.at[li].set(n.astype(jnp.int32))
    needs = {"leaf_need": jnp.max(ltot), "direct_need": jnp.max(d_tot),
             "cand_need": cand_need}
    return acc_rows, needs


def _point_accel(bpos, src_pos, src_mass, soft2):
    """Blocked point-mass kernel: sum_j m_j * d_ij * r_ij^-3 (no G)."""
    dx = src_pos[None, :, 0] - bpos[:, None, 0]
    dy = src_pos[None, :, 1] - bpos[:, None, 1]
    r2 = dx * dx + dy * dy + soft2
    w = src_mass[None, :] * jax.lax.rsqrt(r2) / r2
    return jnp.stack([jnp.sum(w * dx, axis=1), jnp.sum(w * dy, axis=1)], -1)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "group_cap", "max_depth", "frontier_cap",
                     "approx_cap", "leaf_list_cap", "direct_body_cap",
                     "group_chunk", "traversal", "debug_stage", "hier_sizes",
                     "cand_caps", "hier_batch"))
def bh_accel_from_tree(tree: Tree, theta, soft2, G, *, group_size: int,
                       group_cap: int, max_depth: int, frontier_cap: int,
                       approx_cap: int, leaf_list_cap: int,
                       direct_body_cap: int, group_chunk: int,
                       traversal: str = "dense", debug_stage: str = "full",
                       hier_sizes: tuple = (1024, 64, 8),
                       cand_caps: tuple = (65536, 16384, 4096),
                       hier_batch: int = 32):
    """BH accelerations for all bodies; returns (acc, stats).

    ``acc`` is in ORIGINAL body order. ``traversal`` selects the list
    builder: ``"dense"`` (local monotone-MAC classification,
    :func:`_classify_dense`), ``"hier"`` (chunk-hierarchical candidate
    refinement + masked-dense evaluation, :func:`_hier_accel` — the
    large-N fast path; identical interaction sets by the same monotone-MAC
    argument) or ``"bfs"`` (lockstep wave traversal, kept as the
    independently-derived cross-check). dense and bfs produce bit-identical
    lists (tested in tests/test_bh.py); hier is equality-tested against
    dense to f32 summation-order tolerance.
    """
    cap, _ = tree.spos.shape
    GS = min(group_size, cap)
    theta2 = theta * theta
    NC = tree.code.shape[0]
    group_cap = min(group_cap, NC)  # at most one group per node
    spos = tree.spos

    gvalid, gstart, gcount, n_groups = make_groups(tree, GS, group_cap)

    # Group AABBs from contiguous body slices (gather; no segment scatter).
    def aabb(gs, gc, gv):
        sl0 = jnp.clip(gs, 0, cap - GS)
        bpos = jax.lax.dynamic_slice_in_dim(spos, sl0, GS, 0)
        row_slot = sl0 + jnp.arange(GS, dtype=jnp.int32)
        rv = gv & (row_slot >= gs) & (row_slot < gs + gc)
        big = jnp.asarray(jnp.finfo(spos.dtype).max, spos.dtype)
        mn = jnp.min(jnp.where(rv[:, None], bpos, big), axis=0)
        mx = jnp.max(jnp.where(rv[:, None], bpos, -big), axis=0)
        return mn, mx

    gmin, gmax = jax.vmap(aabb)(gstart, gcount, gvalid)
    if debug_stage == "aabb":  # timing probe: groups + boxes only
        return gmin + gmax, None

    # Coverage guard (see TraversalStats): the largest leaf population.
    # Only a max-depth leaf can exceed leaf_size, so this stays small unless
    # the scene collapses > group_size bodies into one max-depth cell.
    node_valid = jnp.arange(NC, dtype=jnp.int32) < tree.n_nodes
    leaf_max = jnp.max(jnp.where(node_valid & (tree.child < 0),
                                 tree.count, 0))

    if traversal == "hier":
        res = _hier_accel(
            tree, gstart, gcount, gvalid, gmin, gmax, theta2, soft2,
            group_size=GS, hier_sizes=hier_sizes, cand_caps=cand_caps,
            leaf_list_cap=leaf_list_cap, direct_body_cap=direct_body_cap,
            hier_batch=hier_batch, debug_stage=debug_stage)
        if debug_stage == "classify":
            return res
        acc_rows, needs = res
        if debug_stage == "force":
            return acc_rows[:, 0], None
        stats = TraversalStats(
            approx_need=jnp.int32(0), leaf_need=needs["leaf_need"],
            direct_need=needs["direct_need"], frontier_need=jnp.int32(0),
            group_need=n_groups, node_need=tree.node_need,
            group_size_need=leaf_max, cand_need=needs["cand_need"])
        return G * _assemble(tree, acc_rows, gstart, GS, group_cap), stats

    # Chunk the traversal over groups: the BFS path's per-wave temporaries
    # are (groups x frontier_cap x 10-lane rows) and the dense path's masks
    # are (groups x num_nodes) — either way a single full batch at large N
    # allocates gigabytes (observed to hard-crash this backend's worker).
    if traversal == "dense":
        tchunk = max(64, (1 << 25) // max(NC, 1))
    else:
        tchunk = 4096
    tchunk = min(group_cap, tchunk)
    n_tchunks = -(-group_cap // tchunk)
    tpad = n_tchunks * tchunk

    def pad_groups(x, fill):
        return jnp.concatenate(
            [x, jnp.full((tpad - group_cap,) + x.shape[1:], fill, x.dtype)])

    def trav_chunk(args):
        gmn, gmx, gv = args
        if traversal == "dense":
            apx, al, lv, ll, a_tot, l_tot = _classify_dense(
                tree, gmn, gmx, gv, theta2, soft2, approx_cap=approx_cap,
                leaf_list_cap=leaf_list_cap)
            fn = jnp.zeros_like(a_tot)
        else:
            apx, al, lv, ll, fn = _traverse_all(
                tree, gmn, gmx, gv, theta2, soft2, max_depth=max_depth,
                frontier_cap=frontier_cap, approx_cap=approx_cap,
                leaf_list_cap=leaf_list_cap)
            a_tot, l_tot = al, ll  # wave lengths count every append (uncapped)
        psl, pv, dn = _direct_partners_all(
            tree, lv, ll, direct_body_cap=direct_body_cap)
        return apx, al, ll, psl, pv, dn, fn, a_tot, l_tot

    targs = jax.tree.map(
        lambda x: x.reshape((n_tchunks, tchunk) + x.shape[1:]),
        (pad_groups(gmin, 0.0), pad_groups(gmax, 0.0),
         pad_groups(gvalid, False)))
    (apx_c, al_c, ll_c, psl_c, pv_c, dn_c, fn_c, at_c,
     lt_c) = jax.lax.map(trav_chunk, targs)
    approx = apx_c.reshape(tpad, approx_cap)[:group_cap]
    a_len = al_c.reshape(tpad)[:group_cap]
    l_len = ll_c.reshape(tpad)[:group_cap]
    pslots = psl_c.reshape(tpad, direct_body_cap)[:group_cap]
    pvalid = pv_c.reshape(tpad, direct_body_cap)[:group_cap]
    d_need = dn_c.reshape(tpad)[:group_cap]
    f_need = fn_c.reshape(tpad)[:group_cap]
    a_need = at_c.reshape(tpad)[:group_cap]
    l_need = lt_c.reshape(tpad)[:group_cap]
    if debug_stage == "classify":  # timing probe: + lists/partners built
        return (jnp.sum(approx) + jnp.sum(pslots)).astype(jnp.float32), None

    # ---- force evaluation, chunked over groups (pure gather + math) ----
    def one_group(gs, gc, gv, apx, al, psl, pv):
        sl0 = jnp.clip(gs, 0, cap - GS)
        bpos = jax.lax.dynamic_slice_in_dim(spos, sl0, GS, 0)
        avalid = jnp.arange(apx.shape[0], dtype=jnp.int32) < al
        aidx = jnp.where(avalid, apx, 0)
        arows = tree.node_rows[aidx]                          # (A, 10)
        acc = _point_accel(bpos, arows[:, 1:3],
                           jnp.where(avalid, arows[:, 0], 0.0), soft2)
        prow = tree.body_rows[psl]                            # (DB, 4)
        acc = acc + _point_accel(bpos, prow[:, 0:2],
                                 jnp.where(pv, prow[:, 2], 0.0), soft2)
        return jnp.where(gv, 1.0, 0.0) * acc

    n_chunks = -(-group_cap // group_chunk)
    pad = n_chunks * group_chunk

    def pad_to(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad - group_cap,) + x.shape[1:], fill, x.dtype)])

    args = (pad_to(gstart, cap), pad_to(gcount, 0), pad_to(gvalid, False),
            pad_to(approx, 0), pad_to(a_len, 0), pad_to(pslots, 0),
            pad_to(pvalid, False))
    args = jax.tree.map(
        lambda x: x.reshape((n_chunks, group_chunk) + x.shape[1:]), args)
    acc_c = jax.lax.map(lambda a: jax.vmap(one_group)(*a), args)
    acc_rows = acc_c.reshape(pad, GS, 2)
    if debug_stage == "force":  # timing probe: + pair blocks, no assembly
        return acc_rows[:, 0], None

    maxes = (jnp.max(a_need), jnp.max(l_need), jnp.max(d_need),
             jnp.max(f_need))
    stats = TraversalStats(
        approx_need=maxes[0], leaf_need=maxes[1], direct_need=maxes[2],
        frontier_need=maxes[3], group_need=n_groups,
        node_need=tree.node_need, group_size_need=leaf_max)
    return G * _assemble(tree, acc_rows, gstart, GS, group_cap), stats


def _assemble(tree: Tree, acc_rows, gstart, GS: int, group_cap: int):
    """Scatter-free assembly: sorted slot -> (group, row) -> orig order."""
    cap = tree.spos.shape[0]
    s = jnp.arange(cap, dtype=jnp.int32)
    g_of_s = jnp.clip(jnp.searchsorted(gstart, s, side="right") - 1,
                      0, group_cap - 1).astype(jnp.int32)
    sl0 = jnp.clip(gstart[g_of_s], 0, cap - GS)
    row = s - sl0
    in_range = (row >= 0) & (row < GS) & (s < tree.n_alive)
    acc_sorted = acc_rows[g_of_s, jnp.clip(row, 0, GS - 1)]
    acc_sorted = jnp.where(in_range[:, None], acc_sorted, 0.0)
    return acc_sorted[tree.unsort]
