"""Multi-chip P3M: sharded deposit + psum mesh + halo-exchanged band.

Scales the :mod:`tpu_nbody.ops.mesh` solver over a device mesh:

* Bodies are DOMAIN-DECOMPOSED along ``"b"``: :func:`reshard_by_hilbert`
  globally sorts bodies by Hilbert code so each shard owns a contiguous
  curve segment (a compact spatial domain). Within a step each shard
  re-sorts locally (cheap) — the decomposition itself is refreshed by
  calling reshard every K steps, K sized so bodies cannot drift farther
  than the short-range radius across a domain boundary between reshards.
* Deposit: each shard CIC-deposits its bodies into a local density grid;
  one ``psum`` over ICI makes the global grid resident on every chip.
* The potential solve is a slab-decomposed distributed FFT
  (:func:`_slab_fft_phi`): reduce-scatter the density rows, per-chip row
  FFTs, an ``all_to_all`` transpose, per-chip column FFTs against this
  chip's kernel column slice, and back — per-chip FFT work drops P-fold
  versus the round-1 replicated transform. The 6th-order FD gradient runs
  on the slabs with a 3-row ``ppermute`` halo, and only the world window
  (nw+1)^2 of (fx, fy) is ``all_gather``-ed for local interpolation.
* Short-range band: each shard's sorted block exchanges a ``band``-row halo
  with its ring neighbors via ``ppermute`` — with Hilbert domain
  decomposition, the ring neighbors ARE the spatial neighbors along the
  curve, so pairs spanning the shard boundary are covered exactly like
  in-shard band pairs.

This is the SURVEY §5.7/§5.8 design point: body tiles ride ICI collectives
(`psum`, `ppermute`) instead of the reference's nonexistent distributed
backend.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.ops import mesh as mesh_ops
from tpu_nbody.ops import morton
from tpu_nbody.parallel.mesh import BODY_AXIS
from tpu_nbody.parallel.sharded import _merge_sharded
from tpu_nbody.state import SimState


class PmShardStats(NamedTuple):
    """Per-block aux of the sharded P3M step, pmax-reduced over shards.

    Coverage is exact (up to each pass's documented cutoff) iff
    ``heavy_need <= heavy_cap_local``, ``rescue_need <= cfg.mesh_rescue``
    (informational: closest-first ranking drops only the farthest boxes),
    ``xport_need <= cfg.mesh_xrescue_export`` and
    ``ximport_need <= cfg.mesh_xrescue``.
    """
    heavy_need: jax.Array
    rescue_need: jax.Array
    xport_need: jax.Array
    ximport_need: jax.Array
    mesh_oob: jax.Array


def _win_rows(ny: int, n_shards: int) -> int:
    """Padded row count of the distributed φ FD window (rows -3..ny+3)."""
    return -(-(ny + 7) // n_shards) * n_shards


def _slab_fft_phi(rho_local, phi_hat, *, axis, n_shards, grid, grid_y, ny):
    """Distributed potential solve: TRIMMED slab-decomposed FFT convolution.

    Round-1 computed the full padded-grid FFT redundantly on every chip;
    round-2 slab-decomposed it (per-chip FFT work drops P-fold); this
    round-4 version adds the single-chip trims (ops/mesh.py
    ``_conv_potential``) and the rectangular grid: the deposit occupies
    only rows 0..ny+1 of the (grid_y, grid) padded grid, so only those
    rows are reduce-scattered and row-rfft'ed; and only φ rows -3..ny+3
    (the FD window incl. wrapped stencil taps) are needed, so the return
    transpose and row-irfft run on those ny+7 rows only. The column
    transforms stay full (every output row mixes all row wavenumbers).

    rho_local: this chip's PARTIAL density (grid_y, grid) (sum over chips =
    the global grid). Steps, all inside shard_map:

    1. reduce-scatter the occupied rows: each chip gets its summed row slab
       (occ_p/P, grid).
    2. rfft along rows (local), all_to_all transpose to column slabs,
       zero-pad rows back to grid_y.
    3. complex FFT along columns (local), multiply by this chip's column
       slice of the potential kernel phî, inverse FFT along columns.
    4. slice the FD-window rows (-3..ny+3), all_to_all back to row slabs,
       irfft along rows -> φ window slab (win_p/P, grid) where
       win_p = :func:`_win_rows`. Row r of the GLOBAL window is padded-grid
       row r-3 (rows 0-2 are the wrapped tail rows grid_y-3..grid_y-1).
    """
    P_ = n_shards
    hw = grid // 2 + 1
    hwp = -(-hw // P_) * P_
    me = jax.lax.axis_index(axis)
    occ_p = min(-(-(ny + 2) // P_) * P_, grid_y)
    win = ny + 7
    win_p = _win_rows(ny, P_)

    slab = jax.lax.psum_scatter(rho_local[:occ_p], axis,
                                scatter_dimension=0,
                                tiled=True)                  # (occ_p/P, grid)
    rh = jnp.fft.rfft(slab, axis=1)                          # (occ_p/P, hw)
    rh = jnp.pad(rh, ((0, 0), (0, hwp - hw)))
    cols = jax.lax.all_to_all(rh, axis, split_axis=1, concat_axis=0,
                              tiled=True)                    # (occ_p, hwp/P)
    cols = jnp.pad(cols, ((0, grid_y - occ_p), (0, 0)))
    ch = jnp.fft.fft(cols, axis=0)
    ph = jnp.pad(phi_hat, ((0, 0), (0, hwp - hw)))
    ph = jax.lax.dynamic_slice(ph, (0, me * (hwp // P_)),
                               (grid_y, hwp // P_))
    ch = jnp.fft.ifft(ch * ph, axis=0)
    rows = jnp.concatenate([ch[-3:], ch[:ny + 4]])           # rows -3..ny+3
    rows = jnp.pad(rows, ((0, win_p - win), (0, 0)))
    back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=1,
                              tiled=True)                    # (win_p/P, hwp)
    return jnp.fft.irfft(back[:, :hw], n=grid, axis=1)       # (win_p/P, grid)


def _fd_force_window(phi_slab, h, *, axis, n_shards, nw, ny):
    """6th-order FD gradient of the distributed φ window, gathered on the
    world window (ny+1, nw+1) every chip's interpolation needs.

    ``phi_slab``: this chip's (win_p/P, grid) slab of the φ FD window
    (global window row r = padded-grid row r-3; see :func:`_slab_fft_phi`).
    The column taps are local rolls (wrap = padded-grid wrap, same as the
    single-chip trimmed path); the ±3 row taps come from slab ring
    neighbors via ppermute. Ring-wrap/padding garbage only ever reaches
    outputs at window rows < 3 or > ny+3, all of which the final world
    slice discards — the kept rows' taps are true window rows by
    construction (the window already contains the ±3 wrapped stencil
    rows). Requires win_p/P >= 3 (single-hop halos).
    """
    rows_local = phi_slab.shape[0]
    assert rows_local >= 3, "need >= 3 window rows per shard"
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    halo_up = jax.lax.ppermute(phi_slab[-3:], axis, fwd)     # rows -3..-1
    halo_dn = jax.lax.ppermute(phi_slab[:3], axis, bwd)      # rows +1..+3
    ext = jnp.concatenate([halo_up, phi_slab, halo_dn])      # (rows+6, grid)

    c1 = 45.0 / (60.0 * h)
    c2 = 9.0 / (60.0 * h)
    c3 = 1.0 / (60.0 * h)
    m = nw + 1
    core = ext[3:3 + rows_local]
    sh = lambda k: jnp.roll(core, -k, axis=1)[:, :m]
    fx = (c1 * (sh(1) - sh(-1)) - c2 * (sh(2) - sh(-2))
          + c3 * (sh(3) - sh(-3)))
    dy = lambda k: ext[3 + k:3 + k + rows_local, :m]
    fy = (c1 * (dy(1) - dy(-1)) - c2 * (dy(2) - dy(-2))
          + c3 * (dy(3) - dy(-3)))
    # gather the window rows, then keep world rows 0..ny (window rows 3..)
    fx_full = jax.lax.all_gather(fx, axis, tiled=True)       # (win_p, m)
    fy_full = jax.lax.all_gather(fy, axis, tiled=True)
    return fx_full[3:4 + ny], fy_full[3:4 + ny]              # (ny+1, m)


def _block_bboxes(spos, smass, salive, band):
    """Alive-only per-block bounding boxes of the locally-sorted shard.

    Returns (X (B, S, 3) packed pos+mass rows, bbox (B, 4) as
    [minx, maxx, miny, maxy]); empty/padding blocks get inverted boxes
    (+big/-big) whose gap to everything is huge, so they never pair."""
    cap = spos.shape[0]
    S = band
    B = -(-cap // S)
    dtype = spos.dtype
    pad = B * S - cap
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)
    fields = jnp.concatenate([fields, jnp.zeros((pad, 3), dtype)])
    live = jnp.concatenate([salive, jnp.zeros((pad,), bool)])
    X = fields.reshape(B, S, 3)
    lv = live.reshape(B, S)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    bbox = jnp.stack(
        [jnp.min(jnp.where(lv, X[..., 0], big), axis=1),
         jnp.max(jnp.where(lv, X[..., 0], -big), axis=1),
         jnp.min(jnp.where(lv, X[..., 1], big), axis=1),
         jnp.max(jnp.where(lv, X[..., 1], -big), axis=1)], axis=1)
    return X, bbox


def _bbox_gap2(bb, other):
    """Squared box-box gap: bb (B, 4) vs other (M, 4) -> (B, M)."""
    gx = jnp.maximum(0.0, jnp.maximum(bb[:, 0:1] - other[None, :, 1],
                                      other[None, :, 0] - bb[:, 1:2]))
    gy = jnp.maximum(0.0, jnp.maximum(bb[:, 2:3] - other[None, :, 3],
                                      other[None, :, 2] - bb[:, 3:4]))
    return gx * gx + gy * gy


def _cross_shard_rescue(spos, smass, salive, soft2, a, *, band, k,
                        export_cap, chunk, axis, n_shards,
                        switch="exp4"):
    """Short-range rescue for block pairs on DIFFERENT shards.

    The shard-local :func:`tpu_nbody.ops.mesh._block_rescue` recovers pairs
    split by Hilbert-curve discontinuities *within* a shard's curve segment;
    pairs whose blocks land on two different shards (a discontinuity
    straddling a domain boundary — exactly the class round 2 measured as
    the dominant single-chip error tail) were documented-dropped in round 2.
    This pass closes that gap with a locally-essential export exchange, the
    same shape as the sharded-BH LET export (``parallel/sharded_bh.py``):

    1. ``all_gather`` every shard's tiny (B, 4) block-bbox table.
    2. Each shard selects up to ``export_cap`` of its own blocks that some
       REMOTE block needs (box gap < 2a and >1 apart in GLOBAL block order
       — global adjacency is already covered exactly by the band's ring
       halo) and ``all_gather``s those block rows (export_cap x band
       bodies — small, because only domain-boundary-adjacent blocks ever
       qualify under a Hilbert decomposition).
    3. Each local block picks its k closest imported remote partner blocks
       (same closest-first ``top_k`` ranking as the local rescue) and sums
       the switch-weighted pair forces densely.

    Returns (acc_sorted (cap, 2), export_need, import_need): coverage is
    exact up to the 2a cutoff iff export_need <= export_cap and
    import_need <= k on every shard.
    """
    cap = spos.shape[0]
    S = band
    dtype = spos.dtype
    X, bbox = _block_bboxes(spos, smass, salive, band)
    B = X.shape[0]
    rcut2 = (2.0 * a) * (2.0 * a)
    me = jax.lax.axis_index(axis)
    gid = me * B + jnp.arange(B)                             # global block id

    bbox_all = jax.lax.all_gather(bbox, axis)                # (P, B, 4)
    gid_all = jnp.arange(n_shards * B)
    remote = (gid_all // B) != me
    g2_all = _bbox_gap2(bbox, bbox_all.reshape(n_shards * B, 4))
    nonadj = jnp.abs(gid[:, None] - gid_all[None, :]) > 1
    need = (g2_all < rcut2) & nonadj & remote[None, :]       # (B, P*B)

    # ---- export: my blocks some remote block needs (symmetric test) ----
    exp_score = jnp.max(jnp.where(need, rcut2 - g2_all, 0.0), axis=1)
    export_need = jnp.sum(exp_score > 0)
    E = min(export_cap, B)
    val, eidx = jax.lax.top_k(exp_score, E)                  # (E,)
    evalid = val > 0
    erows = X.reshape(B, S * 3)[eidx] * evalid[:, None].astype(dtype)
    ebbox = jnp.where(evalid[:, None], bbox[eidx],
                      jnp.asarray([jnp.finfo(dtype).max,
                                   -jnp.finfo(dtype).max,
                                   jnp.finfo(dtype).max,
                                   -jnp.finfo(dtype).max], dtype))
    egid = jnp.where(evalid, gid[eidx], -10)                 # -10: never adj

    imp_rows = jax.lax.all_gather(erows, axis).reshape(n_shards * E, S * 3)
    imp_bbox = jax.lax.all_gather(ebbox, axis).reshape(n_shards * E, 4)
    imp_gid = jax.lax.all_gather(egid, axis).reshape(n_shards * E)
    imp_shard = jnp.repeat(jnp.arange(n_shards), E)

    # ---- import: k closest exported remote blocks per local block ----
    g2_imp = _bbox_gap2(bbox, imp_bbox)                      # (B, P*E)
    cand = ((g2_imp < rcut2) & (imp_shard[None, :] != me)
            & (jnp.abs(gid[:, None] - imp_gid[None, :]) > 1)
            & (imp_gid[None, :] >= 0))
    import_need = jnp.max(jnp.sum(cand, axis=1))
    kk = min(k, n_shards * E)
    score = jnp.where(cand, rcut2 - g2_imp, 0.0)

    cb = max(1, min(B, chunk // S))
    n_chunks = -(-B // cb)
    Xb = jnp.concatenate([X.reshape(B, S * 3),
                          jnp.zeros((n_chunks * cb - B, S * 3), dtype)])
    score_p = jnp.concatenate(
        [score, jnp.zeros((n_chunks * cb - B, score.shape[1]), dtype)])
    starts = jnp.arange(n_chunks) * cb

    def one_chunk(b0):
        sc = jax.lax.dynamic_slice(score_p, (b0, 0), (cb, score.shape[1]))
        mval, midx = jax.lax.top_k(sc, kk)                   # (cb, kk)
        mval = (mval > 0).astype(dtype)
        part = imp_rows[midx].reshape(cb, kk, S, 3)
        pm = (part[..., 2] * mval[:, :, None]).reshape(cb, kk * S)
        px = part[..., 0].reshape(cb, kk * S)
        py = part[..., 1].reshape(cb, kk * S)
        ctr = jax.lax.dynamic_slice(Xb, (b0, 0), (cb, S * 3)) \
            .reshape(cb, S, 3)
        dx = px[:, None, :] - ctr[:, :, None, 0]             # (cb, S, kk*S)
        dy = py[:, None, :] - ctr[:, :, None, 1]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = pm[:, None, :] * (inv * inv * inv)
        w = w * mesh_ops._short_weight(r2, a, switch)
        return jnp.stack([jnp.sum(w * dx, axis=2),
                          jnp.sum(w * dy, axis=2)], axis=-1)

    acc = jax.lax.map(one_chunk, starts)
    return (acc.reshape(n_chunks * cb * S, 2)[:cap],
            export_need.astype(jnp.int32), import_need.astype(jnp.int32))


def _pm_accel_local_sorted(spos, smass, salive, G, soft2, origin, root_side,
                           *, mesh_level, split_cells, band, chunk, rescue_k,
                           axis, n_shards, order=2, interlace=False,
                           mesh_ny=0, xrescue_k=0, xrescue_export=0,
                           deconvolve=True, kernel=None, switch="exp4"):
    """P3M acceleration for a locally Hilbert-SORTED shard (inside shard_map).

    Feature parity with the single-chip :func:`tpu_nbody.ops.mesh.
    pm_accel_sorted` (VERDICT r3 item 4): rectangular mesh (``mesh_ny``),
    assignment ``order``, ``interlace``, trimmed slab-decomposed FFTs, and
    a sorted-frame contract so the step loop can keep state sorted across
    steps instead of re-sorting per force pass. The body arrays must be in
    LOCAL Hilbert order (the device reshard leaves them globally sorted,
    which is stronger); the returned acceleration is in the same order.
    Returns ``(acc, (rescue_need, xport_need, ximport_need, mesh_oob))``.
    """
    if order == 3:
        raise NotImplementedError(
            "TSC (mesh_order=3) is single-chip only for now: the sharded "
            "FD window/interp tables are sized for the CIC reach. Use "
            "order 2 on the sharded path (TSC is an Lz-accuracy knob, not "
            "a throughput one — PERFORMANCE.md momentum table).")
    dtype = spos.dtype
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level
    ny = mesh_ny or nw
    grid = 2 * nw
    grid_y = 2 * ny
    h = root_side / nw
    a = split_cells * h
    smass = jnp.where(salive, smass, 0.0)
    mesh_oob = jnp.int32(0)
    if ny != nw:
        # rect mesh: rows vertically centered on the root center (same
        # window as single-chip pm_accel_sorted; bodies outside clamp to
        # edge rows and are counted)
        oy = origin[1] + 0.5 * root_side - 0.5 * ny * h
        morigin = jnp.stack([origin[0], oy])
        sy = (spos[:, 1] - oy) / h
        mesh_oob = jnp.sum(salive & ((sy < 0.0) | (sy >= ny))
                           ).astype(jnp.int32)
    else:
        morigin = origin

    if kernel is None:
        kernel = mesh_ops._kernel_hats(grid, h, soft2, a, dtype,
                                       grid_y=grid_y,
                                       deconv_order=order if deconvolve
                                       else 0, switch=switch)

    def mesh_pass(mo):
        base, w = mesh_ops._cic_cells(spos, mo, h, nw, order, ny=ny)
        rho_local = mesh_ops._deposit_packed(smass, base, w, nw, grid,
                                             ny=ny, grid_y=grid_y)
        phi_slab = _slab_fft_phi(rho_local, kernel[2], axis=axis,
                                 n_shards=n_shards, grid=grid,
                                 grid_y=grid_y, ny=ny)
        fx, fy = _fd_force_window(phi_slab, h, axis=axis,
                                  n_shards=n_shards, nw=nw, ny=ny)
        return mesh_ops._interp_packed(fx, fy, base, w, nw, ny=ny)

    acc_mesh = mesh_pass(morigin)
    if interlace:
        acc_mesh = 0.5 * (acc_mesh + mesh_pass(morigin - 0.5 * h))

    # ---- short-range band with ring halo exchange ----
    S = band
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    # halo_left = last S rows of the PREVIOUS shard, etc. Ring wrap would
    # create spurious pairs between the global first/last shard; their
    # bodies are spatially unrelated, so mask the wrap edges.
    me = jax.lax.axis_index(axis)
    halo_left = jax.lax.ppermute(fields[-S:], axis, fwd)
    halo_right = jax.lax.ppermute(fields[:S], axis, bwd)
    halo_left = jnp.where(me == 0, 0.0, 1.0) * halo_left
    halo_right = jnp.where(me == n_shards - 1, 0.0, 1.0) * halo_right
    ext = jnp.concatenate([halo_left, fields, halo_right])
    acc_short = mesh_ops._band_short_range(
        ext[:, :2], ext[:, 2], soft2, a, band=S,
        chunk=chunk, switch=switch)[S:S + spos.shape[0]]
    rescue_need = jnp.int32(0)
    xport_need = jnp.int32(0)
    ximp_need = jnp.int32(0)
    if rescue_k:
        # Shard-local block rescue (ops/mesh.py::_block_rescue): recovers
        # short-range pairs split by Hilbert discontinuities WITHIN this
        # shard's curve segment.
        acc_r, rescue_need, _ = mesh_ops._block_rescue(
            spos, smass, salive, soft2, a, band=band, k=rescue_k,
            chunk=chunk, switch=switch)
        acc_short = acc_short + acc_r
    if xrescue_k and n_shards > 1:
        # Cross-shard rescue: discontinuity pairs whose blocks live on two
        # different shards (see _cross_shard_rescue).
        acc_x, xport_need, ximp_need = _cross_shard_rescue(
            spos, smass, salive, soft2, a, band=band, k=xrescue_k,
            export_cap=xrescue_export, chunk=chunk, axis=axis,
            n_shards=n_shards, switch=switch)
        acc_short = acc_short + acc_x

    acc = (acc_mesh + acc_short) * salive[:, None].astype(dtype)
    return G * acc, (rescue_need, xport_need, ximp_need, mesh_oob)


def reshard_by_hilbert(state: SimState, mesh: Mesh, cfg: SimConfig,
                       axis: str = BODY_AXIS) -> SimState:
    """Globally order bodies along the Hilbert curve and re-shard.

    After this, shard s holds the s-th contiguous curve segment — a compact
    spatial domain — which the sharded P3M step's halo exchange relies on.
    Dead slots sort to the end (the last shard). Host-orchestrated (gathers
    to one device); call every K steps, not inside the step loop.
    """
    from tpu_nbody.parallel.mesh import shard_state

    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    codes = morton.hilbert_codes(state.pos, jnp.asarray(origin),
                                 jnp.asarray(2.0 * cfg.root_half),
                                 state.alive)
    order = jnp.argsort(codes, stable=True)
    state = state._replace(
        pos=state.pos[order], vel=state.vel[order],
        mass=jnp.where(state.alive[order], state.mass[order], 0.0),
        alive=state.alive[order])
    return shard_state(state, mesh, axis)


def make_device_reshard(mesh: Mesh, cfg: SimConfig, axis: str = BODY_AXIS):
    """Jitted DEVICE-SIDE global Hilbert reshard: state -> state.

    Replaces the host-orchestrated :func:`reshard_by_hilbert` for the
    periodic in-loop reshard (VERDICT r2 item 7: at N=10M+ a gather of the
    whole state through one device every ``reshard_every`` steps defeats
    the decomposition). Algorithm: block-level ODD-EVEN TRANSPOSITION
    MERGE-SPLIT over the shard axis — each shard sorts locally by Hilbert
    code (dead bodies carry the sort-last sentinel), then P rounds of
    pairwise full-shard ``ppermute`` exchange + merge, the lower-indexed
    shard keeping the lower half. P rounds provably sort P locally-sorted
    blocks (classic odd-even transposition with compare-exchange lifted to
    merge-split), every shard keeps exactly its fixed ``cap/P`` slots at
    all times (no splitter search, no size caps, no overflow path), and
    all traffic rides neighbor ``ppermute`` — nothing is ever gathered.

    Cost per reshard: P x (local sort of 2c keys + one neighbor exchange
    of the full shard rows). Equal Hilbert codes may order differently
    than the host path's single stable argsort (both are valid total
    orders; physics is order-independent).
    """
    n_shards = mesh.shape[axis]
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half

    def local(state: SimState):
        dtype = state.pos.dtype
        mass = jnp.where(state.alive, state.mass, 0.0)
        rows = jnp.concatenate(
            [state.pos, state.vel, mass[:, None],
             state.alive.astype(dtype)[:, None]], axis=1)       # (c, 6)
        codes = morton.hilbert_codes(state.pos, jnp.asarray(origin, dtype),
                                     jnp.asarray(side, dtype), state.alive)
        o = jnp.argsort(codes, stable=True)
        rows, codes = rows[o], codes[o]
        c = rows.shape[0]
        me = jax.lax.axis_index(axis)
        low_take = jnp.arange(c, dtype=jnp.int32)

        for r in range(n_shards):
            # odd-even pairing; unpaired end shards map to themselves
            partner_of = []
            for i in range(n_shards):
                p = i + 1 if (i + r) % 2 == 0 else i - 1
                partner_of.append(p if 0 <= p < n_shards else i)
            perm = [(i, partner_of[i]) for i in range(n_shards)]
            prow = jax.lax.ppermute(rows, axis, perm)
            pcod = jax.lax.ppermute(codes, axis, perm)
            partner = jnp.asarray(partner_of, jnp.int32)[me]
            allc = jnp.concatenate([codes, pcod])
            allr = jnp.concatenate([rows, prow])
            o2 = jnp.argsort(allc, stable=True)
            take = o2[jnp.where(me < partner, low_take, low_take + c)]
            keep = me != partner
            rows = jnp.where(keep, allr[take], rows)
            codes = jnp.where(keep, allc[take], codes)

        return state._replace(pos=rows[:, 0:2], vel=rows[:, 2:4],
                              mass=rows[:, 4], alive=rows[:, 5] > 0.5)

    sharded = P(axis)
    sharded2 = P(axis, None)
    state_specs = SimState(pos=sharded2, vel=sharded2, mass=sharded,
                           alive=sharded, step=P())

    @jax.jit
    def reshard(state: SimState) -> SimState:
        return jax.shard_map(local, mesh=mesh, in_specs=(state_specs,),
                             out_specs=state_specs,
                             check_vma=False)(state)

    return reshard


def make_sharded_pm_step(mesh: Mesh, cfg: SimConfig, *,
                         integrator: str = "kdk",
                         heavy_cap_local: int = 16, axis: str = BODY_AXIS,
                         xrescue_export: int | None = None):
    """Jitted multi-chip P3M step(state, params, n_steps) on ``mesh``.

    The state is stepped in LOCAL Hilbert order: each step (or, with
    ``integrator="kdk_reuse"``, each ``cfg.pm_resort_every``-th step)
    locally re-sorts the shard, mirroring the single-chip persistent-sort
    optimization. A composed local permutation is carried through the call
    and inverted once at the end, so externally visible slot identity is
    unchanged across one ``step_n`` call (exactly like
    ``engine._make_pm_sorted_step``).

    ``xrescue_export`` overrides ``cfg.mesh_xrescue_export`` (the engine
    auto-grows it on ``xport_need`` overflow, like the heavy cap).
    """
    n_shards = mesh.shape[axis]
    if xrescue_export is None:
        xrescue_export = cfg.mesh_xrescue_export
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    K = max(1, cfg.pm_resort_every)

    def accel_sorted(pos, mass, alive, params, kernel):
        return _pm_accel_local_sorted(
            pos, mass, alive, params.G, params.soft2,
            origin, side, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, band=cfg.mesh_band,
            chunk=min(cfg.mesh_chunk, cfg.capacity // n_shards),
            rescue_k=cfg.mesh_rescue, axis=axis, n_shards=n_shards,
            order=cfg.mesh_order, interlace=cfg.mesh_interlace,
            mesh_ny=cfg.mesh_ny, xrescue_k=cfg.mesh_xrescue,
            xrescue_export=xrescue_export,
            deconvolve=cfg.mesh_deconvolve, kernel=kernel,
            switch=cfg.mesh_switch)

    def sort_local(state: SimState, perm):
        codes = morton.hilbert_codes(state.pos,
                                     jnp.asarray(origin, state.pos.dtype),
                                     jnp.asarray(side, state.pos.dtype),
                                     state.alive)
        o = jnp.argsort(codes, stable=True)
        return state._replace(
            pos=state.pos[o], vel=state.vel[o],
            mass=jnp.where(state.alive[o], state.mass[o], 0.0),
            alive=state.alive[o]), perm[o]

    def unsort_local(state: SimState, perm):
        o = jnp.argsort(perm)
        return state._replace(pos=state.pos[o], vel=state.vel[o],
                              mass=state.mass[o], alive=state.alive[o])

    def stats_of(heavy, rsc):
        # pmax so the replicated out_spec is honest (heavy already is).
        return PmShardStats(heavy, *(jax.lax.pmax(v, axis) for v in rsc))

    def local_step(state: SimState, perm, params: Params, kernel):
        state, perm = sort_local(state, perm)
        a, r1 = accel_sorted(state.pos, state.mass, state.alive, params,
                             kernel)
        half = params.dt * 0.5
        if integrator == "kdk":
            vel = state.vel + a * half
            pos = state.pos + vel * params.dt
            # 2nd pass keeps the step-start sort order (bodies move by
            # v*dt << band block extent; same approximation the persistent
            # sort makes across K steps)
            a2, r2 = accel_sorted(pos, state.mass, state.alive, params,
                                  kernel)
            vel = vel + a2 * half
            rsc = jax.tree.map(jnp.maximum, r1, r2)
        elif integrator == "euler":
            vel = state.vel + a * params.dt
            pos = state.pos + vel * params.dt
            rsc = r1
        else:
            raise ValueError(integrator)
        state = state._replace(pos=pos, vel=vel, step=state.step + 1)
        state, heavy = _merge_sharded(state, params, axis=axis,
                                      n_shards=n_shards,
                                      heavy_cap_local=heavy_cap_local)
        return state, perm, stats_of(heavy, rsc)

    # kdk_reuse: one force pass per step + persistent local sort (the
    # sharded mirror of engine._make_pm_sorted_step)
    def local_seed(state: SimState, perm, params: Params, kernel):
        state, perm = sort_local(state, perm)
        acc0, rsc = accel_sorted(state.pos, state.mass, state.alive,
                                 params, kernel)
        return state, perm, acc0, stats_of(jnp.int32(0), rsc)

    def local_one_reuse(state: SimState, perm, acc, i, params, kernel):
        half = params.dt * 0.5
        vel = state.vel + acc * half
        pos = state.pos + vel * params.dt
        a2, rsc = accel_sorted(pos, state.mass, state.alive, params,
                               kernel)
        vel = vel + a2 * half
        state = state._replace(pos=pos, vel=vel, step=state.step + 1)
        state, heavy = _merge_sharded(state, params, axis=axis,
                                      n_shards=n_shards,
                                      heavy_cap_local=heavy_cap_local)

        # resort every K steps: permute state, perm, AND the carried acc
        def do_resort(st, p_, a_):
            codes = morton.hilbert_codes(st.pos,
                                         jnp.asarray(origin, st.pos.dtype),
                                         jnp.asarray(side, st.pos.dtype),
                                         st.alive)
            o = jnp.argsort(codes, stable=True)
            return (st._replace(pos=st.pos[o], vel=st.vel[o],
                                mass=st.mass[o], alive=st.alive[o]),
                    p_[o], a_[o])

        state, perm, a2 = jax.lax.cond(
            (i + 1) % K == 0, do_resort, lambda st, p_, a_: (st, p_, a_),
            state, perm, a2)
        return state, perm, a2, stats_of(heavy, rsc)

    sharded = P(axis)
    sharded2 = P(axis, None)
    state_specs = SimState(pos=sharded2, vel=sharded2, mass=sharded,
                           alive=sharded, step=P())
    param_specs = jax.tree.map(lambda _: P(), Params.default())

    stat_specs = PmShardStats(P(), P(), P(), P(), P())
    kern_specs = (P(), P(), P())

    def smap(fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def make_kernel(params):
        # Long-range kernel FFTs hoisted out of the step loop (they depend
        # only on static config + soft2); inside the scan they are loop
        # constants, replicated across shards.
        return mesh_ops.kernel_hats_for(
            side, params.soft2, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
            dtype=cfg.jdtype, order=cfg.mesh_order,
            deconvolve=cfg.mesh_deconvolve, switch=cfg.mesh_switch)

    unsort = smap(unsort_local, (state_specs, sharded), state_specs)

    if integrator == "kdk_reuse":
        seed = smap(local_seed,
                    (state_specs, sharded, param_specs, kern_specs),
                    (state_specs, sharded, sharded2, stat_specs))
        one_reuse = smap(local_one_reuse,
                         (state_specs, sharded, sharded2, P(), param_specs,
                          kern_specs),
                         (state_specs, sharded, sharded2, stat_specs))

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def step_n(state: SimState, params: Params, n_steps: int = 1):
            """Returns (state, PmShardStats) — max over the executed steps."""
            kernel = make_kernel(params)
            perm = jnp.arange(cfg.capacity, dtype=jnp.int32)
            state, perm, acc, stats = seed(state, perm, params, kernel)

            def body(carry, i):
                s, p, a, st = carry
                s, p, a, st2 = one_reuse(s, p, a, i, params, kernel)
                return (s, p, a, jax.tree.map(jnp.maximum, st, st2)), None

            (state, perm, _, stats), _ = jax.lax.scan(
                body, (state, perm, acc, stats), jnp.arange(n_steps))
            return unsort(state, perm), stats

        return step_n

    one = smap(local_step,
               (state_specs, sharded, param_specs, kern_specs),
               (state_specs, sharded, stat_specs))

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_n(state: SimState, params: Params, n_steps: int = 1):
        """Returns (state, PmShardStats) — max over the executed steps."""
        kernel = make_kernel(params)
        perm = jnp.arange(cfg.capacity, dtype=jnp.int32)
        state, perm, stats = one(state, perm, params, kernel)
        if n_steps > 1:
            def body(carry, _):
                s, p, st = carry
                s, p, st2 = one(s, p, params, kernel)
                return (s, p, jax.tree.map(jnp.maximum, st, st2)), None

            (state, perm, stats), _ = jax.lax.scan(
                body, (state, perm, stats), None, length=n_steps - 1)
        return unsort(state, perm), stats

    return step_n
