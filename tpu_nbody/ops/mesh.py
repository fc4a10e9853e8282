"""P3M (particle-mesh + short-range pair correction) force solver.

The performance solver for large N on TPU. The Barnes-Hut solver
(:mod:`tpu_nbody.ops.tree` / :mod:`traverse`) reproduces the reference's MAC
semantics exactly but is bound by gather/scatter throughput; this solver
reformulates the same softened force law

    F(d) = G * m_src * d / (|d|^2 + eps^2)^(3/2)      (BarnesHutAlg.kt:250-259)

as dense, XLA-friendly work only: sort, prefix scans, FFT convolution, and
sliding-window (banded) pair blocks — no per-interaction gathers.

Force split (standard P3M): F = F_long + F_short with

    F_short(d) = F(d) * exp(-(|d|/a)^4)
    F_long(d)  = F(d) * (1 - exp(-(|d|/a)^4))

``F_long`` is smooth at scale ``a`` (resolvable by a mesh of spacing
h <= a/2) and is computed exactly as a discrete convolution of the deposited
mass grid with the sampled kernel, via zero-padded FFTs (the padded domain is
2x the root quad, so the linear — not periodic — convolution is exact for
bodies inside the root). ``F_short`` decays like exp(-(r/a)^4) and is summed
over a +-``band`` window in Hilbert order: bodies are sorted along the same
space-filling curve as the tree build, so spatial neighbors within ~a are
(almost always) within the window. Window misses cost only the tail of
``F_short``; accuracy is tuned by (mesh_level, split a, band) and measured
against the exact solver in the test suite.

Deviations from exact summation (documented): NGP mass deposit + CIC force
interpolation (mesh-order errors O(h/a)^2), and Hilbert-window misses for the
short-range part. Accuracy is comparable to Barnes-Hut at mid-range theta;
the BH solver remains the reference-exact path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_nbody.ops import morton


def _short_weight(r2, a, switch: str = "exp4"):
    """Short-range switch weight w(r2): F_short = w·F, F_long = (1−w)·F.

    ``exp4`` — exp(−(r/a)⁴): the original split, super-smooth decay,
    ~1e-7 at r = 2a (the rescue cutoff).
    ``poly4`` — (1 − r²/(2a)²)⁴ clamped at 0: compactly supported at
    EXACTLY r = 2a, C³ at the cutoff, and ~6x fewer VPU ops per pair
    than exp on the band/rescue hot paths (measured r5: band 7.8 → 5.9,
    rescue 21.0 → 17.5 ms at N=1M; end-to-end pm force error unchanged —
    tools/r6_experiments.py switch). Both sides of the split consult
    THIS function (the spectral kernel samples 1 − w), so the sum
    F_short + F_long is exact for any choice.
    """
    if switch == "poly4":
        s = r2 / (4.0 * a * a)
        t = jnp.maximum(0.0, 1.0 - s)
        t2 = t * t
        return t2 * t2
    return jnp.exp(-((r2 / (a * a)) ** 2))


def _hilbert_sort(pos, mass, alive, origin, side):
    codes = morton.hilbert_codes(pos, origin, side, alive)
    order = jnp.argsort(codes, stable=True)
    return (pos[order], jnp.where(alive[order], mass[order], 0.0),
            alive[order], jnp.argsort(order))


def _assignment_deconv(grid, grid_y, order, dtype):
    """1/Ŵ² on the rfft2 layout: compensation for the mass-assignment window.

    Deposit convolves the density with the assignment window W and force
    interpolation convolves the force field with W again, so the mesh force
    between two point masses is (W*W*K)(x_i-x_j) instead of the sampled
    kernel K — measured as THE dominant mesh error (the round-2/3 sweeps
    attributed the residual to "CIC quantization of the kernel in the split
    region r ~ a", which is exactly this smoothing). Dividing the kernel hat
    by Ŵ(k)² (classic P3M sharpening, Hockney & Eastwood ch. 8) compensates
    it exactly up to assignment aliasing: measured on the two-disk scene at
    N=1M it cuts the mean force error 2.4x at a=6h (3.2e-4 -> 1.3e-4) and
    lets the split radius shrink to a=3h at BETTER-than-before accuracy
    (1.5e-4), which halves the short-range pair volume (tools/
    r4_experiments.py). Per-axis window FT at wrapped frequency q̃:
    sinc(q̃/N)^order (order 2 = CIC, 1 = NGP); amplification is bounded
    (sinc(1/2)⁻⁸ ≈ 37 at the 2D Nyquist corner for CIC²).
    """
    qx = jnp.arange(grid // 2 + 1).astype(dtype)      # rfft half axis
    wx = jnp.sinc(qx / grid) ** order
    qy = jnp.arange(grid_y)
    qyw = jnp.where(qy <= grid_y // 2, qy, qy - grid_y).astype(dtype)
    wy = jnp.sinc(qyw / grid_y) ** order
    w2 = (wx[None, :] * wy[:, None]) ** 2
    return 1.0 / jnp.maximum(w2, jnp.asarray(1e-6, dtype))


def _kernel_hats(grid, h, soft2, a, dtype, grid_y=None, deconv_order=0,
                 switch="exp4"):
    """Spectral kernels for the long-range convolution: (Kx̂, Kŷ, φ̂).

    Kx̂/Kŷ are rfft2s of the sampled long-range force kernel. Offsets are
    arranged in FFT (wrapped) order over the padded domain; the kernel is
    odd so K(0) = 0 and there is no self-force. The convolution computes
    F(x) = sum_j m_j K(x - x_j), so K(u) is the acceleration a target at
    displacement u FROM the source feels: -u / (|u|^2 + eps^2)^1.5.

    φ̂ is a least-squares *potential* kernel: the per-step convolution can
    then run ONE inverse FFT (φ = irfft2(ρ̂·φ̂)) and recover (fx, fy) with a
    6th-order finite-difference gradient — dense shifts — instead of two
    inverse FFTs. φ̂ is fit so that the FD gradient reproduces (Kx̂, Kŷ)
    exactly where a consistent potential exists:

        D6x·φ̂ ≈ Kx̂,  D6y·φ̂ ≈ Kŷ  with  (D6 f)̂ = i·d6(k)·f̂,
        d6(k) = (45·sin(kh) − 9·sin(2kh) + sin(3kh)) / (30h)
        φ̂ = −i·(d6x·Kx̂ + d6y·Kŷ) / (d6x² + d6y²)   (6th-order)

    The fit residual is the same O((kh)⁶) order as the FD truncation. Modes where both eigenvalues vanish (DC and Nyquist lines)
    get φ̂ = 0; they carry no usable gradient information.

    ``deconv_order`` > 0 multiplies all three hats by the
    :func:`_assignment_deconv` compensation for that assignment order
    (2 = CIC). Must match the deposit/interp scheme actually used.
    """
    gy = grid if grid_y is None else grid_y
    ix = jnp.arange(grid)
    off = jnp.where(ix <= grid // 2, ix, ix - grid).astype(dtype) * h
    iy = jnp.arange(gy)
    offy = jnp.where(iy <= gy // 2, iy, iy - gy).astype(dtype) * h
    # Grid layout is row-major [y][x]: axis 0 = y, axis 1 = x. The padded
    # grid may be RECTANGULAR (gy rows x grid cols, same cell size): the
    # reference world is 3x wider than tall, so a square mesh over the
    # (square, tree-driven) root quad wastes most y rows on empty space —
    # column FFTs, deposit planes and interp tables all shrink with gy.
    dy = offy[:, None]
    dx = off[None, :]
    r2 = dx * dx + dy * dy
    inv = jax.lax.rsqrt(r2 + soft2) / (r2 + soft2)
    long_frac = 1.0 - _short_weight(r2, a, switch)
    kx = -dx * inv * long_frac
    ky = -dy * inv * long_frac
    kx_hat = jnp.fft.rfft2(kx)
    ky_hat = jnp.fft.rfft2(ky)
    # FD eigenvalues on the rfft2 output layout: axis 0 full, axis 1 half.
    tw = 2.0 * jnp.pi * jnp.arange(grid).astype(dtype) / grid
    d6 = (45.0 * jnp.sin(tw) - 9.0 * jnp.sin(2.0 * tw)
          + jnp.sin(3.0 * tw)) / (30.0 * h)
    twy = 2.0 * jnp.pi * jnp.arange(gy).astype(dtype) / gy
    d6yv = (45.0 * jnp.sin(twy) - 9.0 * jnp.sin(2.0 * twy)
            + jnp.sin(3.0 * twy)) / (30.0 * h)
    d6y = d6yv[:, None]
    d6x = d6[None, : grid // 2 + 1]
    den = d6x * d6x + d6y * d6y
    safe = jnp.where(den > 0, den, 1.0)
    phi_hat = jnp.where(den > 0,
                        -1j * (d6x * kx_hat + d6y * ky_hat) / safe,
                        0.0)
    if deconv_order:
        d = _assignment_deconv(grid, gy, deconv_order, dtype)
        kx_hat, ky_hat, phi_hat = kx_hat * d, ky_hat * d, phi_hat * d
    return kx_hat, ky_hat, phi_hat


@functools.partial(jax.jit, static_argnames=("mesh_level", "split_cells",
                                              "mesh_ny", "dtype", "order",
                                              "deconvolve", "switch"))
def kernel_hats_for(root_side, soft2, *, mesh_level: int, split_cells: float,
                    mesh_ny: int = 0, dtype=jnp.float32, order: int = 2,
                    deconvolve: bool = True, switch: str = "exp4"):
    """Precompute the (Kx_hat, Ky_hat, phi_hat) long-range kernel FFTs.

    They depend only on static config + per-run-constant ``soft2``, so hoist
    them out of the step loop: two full padded-grid rfft2s per force pass
    (~40% of the P3M FFT work at N=1M) become one computation per jitted
    step_n call, carried into ``lax.scan`` as loop constants. Pass the result
    as ``pm_accel(..., kernel=...)``. ``mesh_ny``: rectangular world grid
    rows (0 = square nw x nw). ``order``/``deconvolve``: mass-assignment
    order and whether to bake the Ŵ⁻² sharpening into the hats (see
    :func:`_assignment_deconv`) — must match the consuming deposit/interp.
    """
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level
    ny = mesh_ny or nw
    grid = 2 * nw
    h = root_side / nw
    a = split_cells * h
    return _kernel_hats(grid, h, soft2, a, dtype, grid_y=2 * ny,
                        deconv_order=order if deconvolve else 0,
                        switch=switch)


def _band_short_range(spos, smass, soft2, a, *, band: int, chunk: int,
                      switch: str = "exp4"):
    """Short-range pair sum over a sorted-order band.

    Block-tridiagonal formulation: bodies are split into blocks of ``band``
    consecutive sorted slots; each block interacts densely with itself and
    both neighbor blocks, guaranteeing coverage of every pair within
    ``band`` sorted positions (and then some). Pure reshapes/slices + fused
    elementwise pair math — no gathers, no im2col (whose feature ordering
    proved unreliable on this backend for wide windows). Padding partners
    carry mass 0; blocks stream through ``lax.map`` chunks to bound memory.
    """
    cap = spos.shape[0]
    S = band
    nb = -(-cap // S)
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)  # (cap, 3)
    fields = jnp.concatenate(
        [fields, jnp.zeros((nb * S - cap, 3), spos.dtype)])
    X = fields.reshape(nb, S, 3)
    # zero guard blocks on both ends: no wraparound pairs
    Xp = jnp.concatenate([jnp.zeros((1, S, 3), spos.dtype), X,
                          jnp.zeros((1, S, 3), spos.dtype)])

    cb = max(1, min(nb, chunk // S))          # blocks per map chunk
    n_chunks = -(-nb // cb)
    pad_blocks = n_chunks * cb - nb
    Xp = jnp.concatenate([Xp, jnp.zeros((pad_blocks, S, 3), spos.dtype)])
    starts = jnp.arange(n_chunks) * cb

    def one_chunk(b0):
        ctr = jax.lax.dynamic_slice(Xp, (b0 + 1, 0, 0), (cb, S, 3))
        left = jax.lax.dynamic_slice(Xp, (b0, 0, 0), (cb, S, 3))
        right = jax.lax.dynamic_slice(Xp, (b0 + 2, 0, 0), (cb, S, 3))
        part = jnp.concatenate([left, ctr, right], axis=1)   # (cb, 3S, 3)
        dx = part[:, None, :, 0] - ctr[:, :, None, 0]        # (cb, S, 3S)
        dy = part[:, None, :, 1] - ctr[:, :, None, 1]
        mj = part[:, None, :, 2]
        r2 = dx * dx + dy * dy
        # rsqrt^3 instead of rsqrt/q: the divide is multi-op on the VPU and
        # the pair passes run at compute speed-of-light (~89 Gpairs/s) —
        # measured ~10% off the band pass (tools/r4_experiments.py pairops).
        inv = jax.lax.rsqrt(r2 + soft2)
        w = mj * (inv * inv * inv)
        w = w * _short_weight(r2, a, switch)
        return jnp.stack([jnp.sum(w * dx, axis=2),
                          jnp.sum(w * dy, axis=2)], axis=-1)  # (cb, S, 2)

    acc = jax.lax.map(one_chunk, starts)
    return acc.reshape(n_chunks * cb * S, 2)[:cap]


def _block_rescue(spos, smass, salive, soft2, a, *, band: int, k: int,
                  chunk: int, k_hot: int = 0, hot_cap: int = 128,
                  switch: str = "exp4"):
    """Exact short-range rescue for pairs >1 block apart in sorted order.

    The tri-diagonal band covers every pair within one ``band``-block in
    Hilbert order, but the curve has discontinuities (above all the world
    center cross, where the densest scene regions sit): spatial neighbors
    can land many blocks apart and silently lose their short-range force —
    measured at N=50k this dominated the force-error tail (band error p50
    ~1e-9 vs p99 ~1e-2). This pass finds, per block, up to ``k`` partner
    blocks that are (a) >1 block away in sorted order and (b) within the
    short-range cutoff 2a of its bounding box, and sums those pair forces
    densely. All dense ops on the already-sorted arrays: segment min/max
    bounding boxes, a chunked B x B box-distance test, ``top_k`` partner
    selection, and one block-granular row gather — no second sort, no
    scatter-back (results stay in the sorted frame).

    Coverage is exact up to the cutoff (the switch weight at r = 2a is
    exp(-16) ~ 1e-7) PROVIDED no block needs more than ``k`` partners;
    returns (acc_sorted (cap, 2), need, hot_count) where ``need`` is the max
    partner count any block wanted. The engine surfaces it as
    ``Engine.last_rescue_need`` but deliberately does NOT auto-grow ``k``:
    partners are ranked closest-box-first, so overflow drops only the
    farthest boxes, whose pair weights are the smallest (measured at N=1M
    the dense core wants up to 97 partners while k=12 already matches k=24
    accuracy — PERFORMANCE.md).

    TWO-TIER mode (``k_hot > k``): the partner-count distribution is
    extremely skewed — at the N=1M bench scene the median block wants 0-2
    partners while the dense core wants up to ~97, so paying ``k=12`` pair
    blocks for EVERY block is ~3x wasted pair math. With ``k_hot`` set, all
    blocks run the cheap base tier ``k``, then the (at most ``hot_cap``)
    blocks whose exact need exceeds ``k`` run a second pass over partner
    ranks ``k..k_hot-1`` from the SAME closest-first ranking (identical
    score array, so the tiers partition the top-``k_hot`` exactly — no
    double counting). ``hot_count`` reports how many blocks were hot;
    coverage requires ``hot_count <= hot_cap`` (overflowing hot blocks
    silently stay at the base tier).
    """
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
    # alive-only bounding boxes; empty blocks get inverted boxes whose gap
    # to everything is huge => no partners.
    bminx = jnp.min(jnp.where(lv, X[..., 0], big), axis=1)
    bmaxx = jnp.max(jnp.where(lv, X[..., 0], -big), axis=1)
    bminy = jnp.min(jnp.where(lv, X[..., 1], big), axis=1)
    bmaxy = jnp.max(jnp.where(lv, X[..., 1], -big), axis=1)
    rcut2 = (2.0 * a) * (2.0 * a)

    k = min(k, B)
    cb = max(1, min(B, chunk // S))
    n_chunks = -(-B // cb)
    Xb = jnp.concatenate([X.reshape(B, S * 3),
                          jnp.zeros((n_chunks * cb - B, S * 3), dtype)])
    bbox = jnp.stack([bminx, bmaxx, bminy, bmaxy], axis=1)
    bbox = jnp.concatenate(
        [bbox, jnp.broadcast_to(jnp.asarray([big, -big, big, -big], dtype),
                                (n_chunks * cb - B, 4))])
    starts = jnp.arange(n_chunks) * cb
    idx_all = jnp.arange(B)

    def one_chunk(b0):
        bb = jax.lax.dynamic_slice(bbox, (b0, 0), (cb, 4))  # my boxes
        gx = jnp.maximum(0.0, jnp.maximum(bb[:, 0:1] - bmaxx[None, :],
                                          bminx[None, :] - bb[:, 1:2]))
        gy = jnp.maximum(0.0, jnp.maximum(bb[:, 2:3] - bmaxy[None, :],
                                          bminy[None, :] - bb[:, 3:4]))
        g2 = gx * gx + gy * gy
        near = g2 < rcut2                                   # (cb, B)
        dblk = jnp.abs((b0 + jnp.arange(cb))[:, None] - idx_all[None, :])
        mask = near & (dblk > 1)
        cnt = jnp.sum(mask, axis=1)                         # partners needed
        # rank candidates closest-box-first so that if cnt > k the dropped
        # partners are the farthest (their pair weights are the smallest)
        score = jnp.where(mask, rcut2 - g2, 0.0)
        mval, midx = jax.lax.top_k(score, k)                # (cb, k)
        mval = (mval > 0).astype(dtype)
        part = Xb[midx].reshape(cb, k, S, 3)                # block row gather
        pm = part[..., 2] * mval[:, :, None]                # invalid -> m=0
        px = part[..., 0].reshape(cb, k * S)
        py = part[..., 1].reshape(cb, k * S)
        pm = pm.reshape(cb, k * S)
        ctr = jax.lax.dynamic_slice(Xb, (b0, 0), (cb, S * 3)) \
            .reshape(cb, S, 3)
        dx = px[:, None, :] - ctr[:, :, None, 0]            # (cb, S, kS)
        dy = py[:, None, :] - ctr[:, :, None, 1]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = pm[:, None, :] * (inv * inv * inv)
        w = w * _short_weight(r2, a, switch)
        acc = jnp.stack([jnp.sum(w * dx, axis=2),
                         jnp.sum(w * dy, axis=2)], axis=-1)  # (cb, S, 2)
        return acc, cnt

    acc, cnt_c = jax.lax.map(one_chunk, starts)
    acc = acc.reshape(n_chunks * cb * S, 2)
    cnt_all = cnt_c.reshape(n_chunks * cb)[:B]                # exact needs
    need = jnp.max(cnt_all)
    hot_count = jnp.sum(cnt_all > k)

    if k_hot > k:
        H = min(hot_cap, B)
        kh = min(k_hot, B)
        hot = cnt_all > k
        hrank = jnp.cumsum(hot.astype(jnp.int32))             # 1-indexed
        hid = jnp.clip(jnp.searchsorted(
            hrank, jnp.arange(1, H + 1, dtype=jnp.int32), side="left"),
            0, B - 1).astype(jnp.int32)
        hvalid = jnp.arange(H) < jnp.minimum(hot_count, H)
        bb = bbox[hid]                                        # (H, 4)
        gx = jnp.maximum(0.0, jnp.maximum(bb[:, 0:1] - bmaxx[None, :],
                                          bminx[None, :] - bb[:, 1:2]))
        gy = jnp.maximum(0.0, jnp.maximum(bb[:, 2:3] - bmaxy[None, :],
                                          bminy[None, :] - bb[:, 3:4]))
        g2 = gx * gx + gy * gy
        dblk = jnp.abs(hid[:, None] - idx_all[None, :])
        mask = (g2 < rcut2) & (dblk > 1)
        score = jnp.where(mask, rcut2 - g2, 0.0)
        mval, midx = jax.lax.top_k(score, kh)                 # (H, kh)
        mval2 = mval[:, k:]                                   # ranks k..kh-1
        midx2 = midx[:, k:]
        k2 = kh - k
        pmask = ((mval2 > 0) & hvalid[:, None]).astype(dtype)
        part = Xb[midx2].reshape(H, k2, S, 3)
        pm = (part[..., 2] * pmask[:, :, None]).reshape(H, k2 * S)
        px = part[..., 0].reshape(H, k2 * S)
        py = part[..., 1].reshape(H, k2 * S)
        ctr = Xb[hid].reshape(H, S, 3)
        dx = px[:, None, :] - ctr[:, :, None, 0]              # (H, S, k2*S)
        dy = py[:, None, :] - ctr[:, :, None, 1]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = pm[:, None, :] * (inv * inv * inv)
        w = w * _short_weight(r2, a, switch)
        acc2 = jnp.stack([jnp.sum(w * dx, axis=2),
                          jnp.sum(w * dy, axis=2)], axis=-1)  # (H, S, 2)
        rows = (hid[:, None] * S
                + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
        acc = acc.at[rows].add(
            jnp.where(hvalid[:, None, None], acc2, 0.0).reshape(-1, 2))

    return acc[:cap], need, hot_count


def _cic_cells(spos, origin, h, nw, order, ny=None):
    """Base world cell (row-major, clipped) + per-offset weights.

    order 2 (CIC): weights (n, 4) for offsets [(0,0), (+x,0), (0,+y),
    (+x,+y)] in cell-center coordinates. order 1 (NGP): weights (n, 1) for
    the containing cell. order 3 (TSC, triangular-shaped cloud): weights
    (n, 9) for the 3x3 window around the containing cell, base = its LOW
    corner; per-axis weights at offset distance d from the containing
    cell's center: [(0.5-d)^2/2, 0.75-d^2, (0.5+d)^2/2] (Hockney &
    Eastwood ch. 5 — the next assignment order above CIC, continuous
    first derivative). The base is clipped to [0, n-1] per axis (nw
    columns, ``ny`` or nw rows); positive offsets deliberately reach
    row/column n (n+1 for TSC) — the first padded rows/cols of the FFT
    domain — which is physically correct for bodies within ~h of the
    world's high edge.
    """
    dtype = spos.dtype
    ny = nw if ny is None else ny
    scaled = (spos - origin) / h
    if order == 1:
        cx = jnp.clip(jnp.floor(scaled[:, 0]).astype(jnp.int32), 0, nw - 1)
        cy = jnp.clip(jnp.floor(scaled[:, 1]).astype(jnp.int32), 0, ny - 1)
        return cy * nw + cx, jnp.ones((spos.shape[0], 1), dtype)
    if order == 3:
        c = jnp.floor(scaled).astype(jnp.int32)       # containing cell
        d = (scaled - c.astype(dtype)) - 0.5          # in [-0.5, 0.5)
        bx = jnp.clip(c[:, 0] - 1, 0, nw - 1)
        by = jnp.clip(c[:, 1] - 1, 0, ny - 1)

        def w3(di):
            return jnp.stack([0.5 * (0.5 - di) ** 2,
                              0.75 - di * di,
                              0.5 * (0.5 + di) ** 2], axis=1)   # (n, 3)

        wx = w3(d[:, 0])
        wy = w3(d[:, 1])
        # offset order k = 3*oy + ox, matching _deposit_packed/_interp_packed
        w9 = (wy[:, :, None] * wx[:, None, :]).reshape(-1, 9)
        return by * nw + bx, w9
    u = scaled - 0.5                   # in cell-CENTER coordinates
    b = jnp.floor(u).astype(jnp.int32)
    frac = u - b.astype(dtype)         # in [0, 1)
    bx = jnp.clip(b[:, 0], 0, nw - 1)
    by = jnp.clip(b[:, 1], 0, ny - 1)
    wx1, wy1 = frac[:, 0], frac[:, 1]
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    w4 = jnp.stack([wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1], axis=1)
    return by * nw + bx, w4


def _seg_suffix_sum(vals, last_of_run):
    """Per-element suffix sum within runs: t_i = v_i + (last_i ? 0 : t_%i+1).

    Segmented +-scan as one ``associative_scan`` over (flag, value) pairs —
    the classic segmented-scan operator, run in reverse so every run's
    TOTAL lands on its FIRST element. ``vals`` is (..., n) (scan along the
    last axis), ``last_of_run`` (n,) bool. Within-run partial sums only, so
    no global-cumsum precision loss (unlike prefix-difference schemes).
    """
    def combine(a, b):
        # b = element nearer the scan start (lower index in reverse mode),
        # a = accumulated suffix; a run-end flag on b blocks a's carry.
        af, av = a
        bf, bv = b
        return af | bf, bv + jnp.where(bf, jnp.zeros_like(av), av)

    flags = jnp.broadcast_to(last_of_run, vals.shape)
    _, t = jax.lax.associative_scan(combine, (flags, vals),
                                    axis=vals.ndim - 1, reverse=True)
    return t


def _deposit_packed(smass, base, w, nw, grid, run_compress: bool = False,
                    ny=None, grid_y=None):
    """Mass deposit via four INDEPENDENT plane scatters.

    Measured on this backend at N=1M, nw=4096 (tools/scatter_micro.py):
    4 scalar scatter-adds into one shared (grid^2,) array take 53 ms (the
    chain serializes), a single (n, 4) row-scatter into (nw^2, 4) takes
    106 ms (the 4-lane minor dim tiles terribly), but 4 scatter-adds into
    four *independent* (nw^2,) accumulators run concurrently: 16 ms. Each
    CIC offset gets its own plane at the shared BASE cell; the planes then
    combine into the padded FFT grid with dense pad-shift adds (offsets:
    0=(0,0) 1=(+x) 2=(+y) 3=(+x,+y)).

    ``run_compress``: bodies arrive Hilbert-SORTED, so bodies in the same
    cell are contiguous runs of equal ``base``; pre-summing runs before the
    scatter removes same-cell read-modify-write conflicts (the measured gap
    between clustered 59 ms and uniform 16 ms deposits at N=1M).
    ``True``/``1``: exact full-run compression via a segmented reverse
    associative_scan — MEASURED A NET LOSS on this backend at N=1M (72 ms:
    the 4-lane scan costs more than the conflicts it removes). Integer
    W > 1: window-W compression — same-cell bodies are pre-summed within
    fixed W-slot windows by DENSE compares/madds that XLA fuses into a
    couple of elementwise kernels (no scan), cutting per-cell conflict
    depth ~W x at ~1 ms of vector work. Any mode is exact up to per-cell
    summation order.
    """
    dtype = smass.dtype
    ny = nw if ny is None else ny
    grid_y = grid if grid_y is None else grid_y
    K = w.shape[1]
    if run_compress and int(run_compress) > 1:
        W = int(run_compress)
        n = base.shape[0]
        nb = n // W
        assert nb * W == n, "capacity must be divisible by the window"
        bw = base.reshape(nb, W)
        vw = (smass[:, None] * w).T.reshape(K, nb, W)
        eq = bw[:, :, None] == bw[:, None, :]                 # (nb, W, W)
        jj = jnp.arange(W, dtype=jnp.int32)
        upper = jj[:, None] <= jj[None, :]                    # k >= j
        first = ~jnp.any(eq & ~upper, axis=2)                 # no earlier eq
        take = eq & upper                                     # (nb, W, W)
        contrib = jnp.sum(jnp.where(take[None], vw[:, :, None, :], 0.0),
                          axis=3)                             # (K, nb, W)
        tgt = jnp.where(first, bw, ny * nw).reshape(n)
        vals_f = jnp.where(first[None], contrib, 0.0).reshape(K, n)
        planes = [jnp.zeros((ny * nw + 1,), dtype)
                  .at[tgt].add(vals_f[k], mode="drop")[:ny * nw]
                  .reshape(ny, nw) for k in range(K)]
    elif run_compress:
        vals = (smass[:, None] * w).T                     # (K, n)
        last = jnp.concatenate([base[1:] != base[:-1],
                                jnp.ones((1,), bool)])
        runsum = _seg_suffix_sum(vals, last)              # (K, n)
        first = jnp.concatenate([jnp.ones((1,), bool),
                                 base[1:] != base[:-1]])
        tgt = jnp.where(first, base, ny * nw)             # dump non-firsts
        vals_f = jnp.where(first[None, :], runsum, 0.0)
        planes = [jnp.zeros((ny * nw + 1,), dtype)
                  .at[tgt].add(vals_f[k], mode="drop")[:ny * nw]
                  .reshape(ny, nw) for k in range(K)]
    else:
        planes = [jnp.zeros((ny * nw,), dtype).at[base].add(smass * w[:, k])
                  .reshape(ny, nw) for k in range(K)]
    if K == 1:
        world = jnp.pad(planes[0], ((0, 1), (0, 1)))
    elif K == 9:
        # TSC: 3x3 offsets from the base (low corner), canvas (ny+2, nw+2)
        world = sum(jnp.pad(planes[3 * oy + ox], ((oy, 2 - oy), (ox, 2 - ox)))
                    for oy in range(3) for ox in range(3))
    else:
        world = (jnp.pad(planes[0], ((0, 1), (0, 1)))
                 + jnp.pad(planes[1], ((0, 1), (1, 0)))
                 + jnp.pad(planes[2], ((1, 0), (0, 1)))
                 + jnp.pad(planes[3], ((1, 0), (1, 0))))
    rho = jnp.zeros((grid_y, grid), dtype)
    return jax.lax.dynamic_update_slice(rho, world, (0, 0))


def _interp_table(fx, fy, nw, order, ny=None):
    """Pack the force-grid windows into per-cell interpolation rows.

    The (fx, fy) values of every cell a body of the given assignment order
    touches are packed into one (ny*nw, 2K) row-major table by dense
    shifted slices of the force grids (K = 1 NGP / 4 CIC / 9 TSC cells),
    so each body later fetches ONE 2K-lane row instead of K two-lane
    gathers (~6x cheaper at N=1M). Split from :func:`_interp_rows` so a
    subcycled step loop can build the ~268 MB table once per mesh refresh
    and pay only the row gather per step (the table build's dense HBM
    traffic was most of the interp phase's gap to its gather ceiling).
    """
    ny = nw if ny is None else ny
    sl = lambda gz, dy, dx: jax.lax.dynamic_slice(gz, (dy, dx), (ny, nw))
    if order == 1:
        F = jnp.stack([sl(fx, 0, 0), sl(fy, 0, 0)], axis=-1)
        return F.reshape(ny * nw, 2)
    if order == 3:
        F = jnp.stack([s for oy in range(3) for ox in range(3)
                       for s in (sl(fx, oy, ox), sl(fy, oy, ox))], axis=-1)
        return F.reshape(ny * nw, 18)
    F = jnp.stack([sl(fx, 0, 0), sl(fy, 0, 0), sl(fx, 0, 1), sl(fy, 0, 1),
                   sl(fx, 1, 0), sl(fy, 1, 0), sl(fx, 1, 1), sl(fy, 1, 1)],
                  axis=-1)
    return F.reshape(ny * nw, 8)


def _interp_rows(F, base, w, frac=None):
    """One row-gather per body from a packed :func:`_interp_table`.

    A table with 4K lanes carries ``[T | ΔT]`` (see :func:`pm_mesh_state`):
    the gathered rows are extrapolated ``T + frac·ΔT`` before the weighted
    sum — one fused multiply-add on data already in registers.
    """
    K = w.shape[1]
    rows = F[base]                                  # (n, 2K) single gather
    if F.shape[1] == 4 * K:
        f = jnp.zeros((), rows.dtype) if frac is None else frac
        rows = rows[:, :2 * K] + f * rows[:, 2 * K:]
    if K == 1:
        return rows * w[:, 0:1]
    ax = sum(w[:, k] * rows[:, 2 * k] for k in range(K))
    ay = sum(w[:, k] * rows[:, 2 * k + 1] for k in range(K))
    return jnp.stack([ax, ay], axis=-1)


def _interp_packed(fx, fy, base, w, nw, ny=None):
    """Force interpolation with ONE row-gather per body.

    Must mirror :func:`_deposit_packed`'s assignment exactly so the odd
    kernel's self-force cancels. See :func:`_interp_table` /
    :func:`_interp_rows` for the split used by the subcycled path.
    """
    order = {1: 1, 4: 2, 9: 3}[w.shape[1]]
    return _interp_rows(_interp_table(fx, fy, nw, order, ny=ny), base, w)


def _conv_potential(rho, phi_hat, ny, grid, grid_y, extra=0):
    """Trimmed FFT convolution: deposited grid -> potential FD window.

    Measured bit-exact vs full rfft2/irfft2 (tools/r3_experiments.py): the
    deposit occupies only rows 0..ny+1 of the doubled padded grid (0..ny+2
    for TSC), so the forward row-rffts run on those rows only; and only phi
    rows -3..ny+3+extra (the FD window incl. the wrapped stencil taps) are
    needed, so the inverse row-irfft runs on ny+7+extra of the 2*ny rows.
    The column transforms must stay full (every output row mixes all row
    wavenumbers). ``extra``: widen the window by this many high rows (1 for
    TSC interpolation's longer reach). Returns the (ny+7+extra, grid)
    potential rows -3..ny+3+extra.
    """
    occ = ny + 2 + extra
    rh = jnp.fft.rfft(rho[:occ], axis=1)
    rh = jnp.pad(rh, ((0, grid_y - occ), (0, 0)))
    sp = jnp.fft.ifft(jnp.fft.fft(rh, axis=0) * phi_hat, axis=0)
    rows = jnp.concatenate([sp[-3:], sp[:ny + 4 + extra]])
    return jnp.fft.irfft(rows, n=grid, axis=1)


def _mesh_grids_one(spos, smass, origin, h, nw, grid, order, kernel,
                    ny=None):
    """Deposit -> FFT convolution -> FD gradient, for one grid registration.

    Returns the force-grid windows ``(fx, fy)`` of shape (ny+1+reach,
    nw+1+reach) — the long-range force field sampled at world cell corners,
    ready for :func:`_mesh_interp_one`. Split out of the fused
    deposit+interp path so a step loop can REUSE the grids across several
    steps (``pm_mesh_every`` subcycling: F_long is smooth in time — the
    source distribution evolves on the bulk dynamical timescale, so the
    grids can be stale while each step still interpolates at the bodies'
    CURRENT positions).
    """
    ny = nw if ny is None else ny
    grid_y = grid if ny == nw else 2 * ny
    reach = 1 if order == 3 else 0  # TSC reads one more row/col of (fx, fy)
    base, w = _cic_cells(spos, origin, h, nw, order, ny=ny)
    rho = _deposit_packed(smass, base, w, nw, grid, ny=ny, grid_y=grid_y)
    _, _, phi_hat = kernel
    pw = _conv_potential(rho, phi_hat, ny, grid, grid_y, extra=reach)
    # 6th-order FD gradient, evaluated only on the interpolation window
    # (cells 0..nw in x, 0..ny in y). The stencil reaches [-3, n+3] per
    # axis; the three negative taps wrap to the far padded edge
    # (rows/cols grid-3..grid-1, realized by the sp[-3:] slice above and
    # the column roll below). Those taps read the aliased region of the
    # doubled-domain convolution (wrap-around from mass near the opposite
    # world edge); the alias is bounded by the far-field kernel smoothness
    # — O(h*M/L^2) after differencing — and negligible next to the mesh
    # error, but boundary cells are not exact (zero-pad phi by 3 rows/cols
    # if that ever matters).
    win = nw + 7 + reach
    pw = jnp.roll(pw, 3, axis=1)[:, :win]
    c1 = 45.0 / (60.0 * h)
    c2 = 9.0 / (60.0 * h)
    c3 = 1.0 / (60.0 * h)
    mx = nw + 1 + reach
    my = ny + 1 + reach
    fx = (c1 * (pw[3:3 + my, 4:4 + mx] - pw[3:3 + my, 2:2 + mx])
          - c2 * (pw[3:3 + my, 5:5 + mx] - pw[3:3 + my, 1:1 + mx])
          + c3 * (pw[3:3 + my, 6:6 + mx] - pw[3:3 + my, 0:0 + mx]))
    fy = (c1 * (pw[4:4 + my, 3:3 + mx] - pw[2:2 + my, 3:3 + mx])
          - c2 * (pw[5:5 + my, 3:3 + mx] - pw[1:1 + my, 3:3 + mx])
          + c3 * (pw[6:6 + my, 3:3 + mx] - pw[0:0 + my, 3:3 + mx]))
    return fx, fy


def _mesh_interp_one(grids, spos, origin, h, nw, order, ny=None):
    """Interpolate precomputed force grids at the given positions."""
    fx, fy = grids
    base, w = _cic_cells(spos, origin, h, nw, order, ny=ny)
    return _interp_packed(fx, fy, base, w, nw, ny=ny)


def _mesh_force(spos, smass, origin, h, nw, grid, soft2, a, order, kernel,
                ny=None):
    """Deposit -> FFT convolution -> interpolate, for one grid registration.

    Deposit and interpolation MUST use the same assignment scheme: for the
    odd force kernel, symmetric deposit/interp makes the self-force cancel
    exactly (mixed schemes leave a large spurious self-kick).

    ``ny``: rectangular world-grid rows (columns stay nw; same cell size).
    The padded FFT grid is (2*ny, 2*nw) and ``kernel`` must be built for it
    (``kernel_hats_for(..., mesh_ny=ny)``).
    """
    grids = _mesh_grids_one(spos, smass, origin, h, nw, grid, order, kernel,
                            ny=ny)
    return _mesh_interp_one(grids, spos, origin, h, nw, order, ny=ny)


def _pm_geometry(origin, root_side, mesh_level, mesh_ny, split_cells, dtype):
    """Shared mesh geometry: (nw, ny, grid, grid_y, h, a, morigin).

    ``morigin`` is the world-grid origin — equal to the root origin for a
    square mesh, shifted to vertically center the ``mesh_ny``-row window on
    the root center for a rectangular one.
    """
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level
    ny = mesh_ny or nw
    grid = 2 * nw
    grid_y = grid if ny == nw else 2 * ny
    h = root_side / nw
    a = split_cells * h
    if ny != nw:
        oy = origin[1] + 0.5 * root_side - 0.5 * ny * h
        morigin = jnp.stack([origin[0], oy])
    else:
        morigin = origin
    return nw, ny, grid, grid_y, h, a, morigin


def pm_mesh_state(spos, smass, salive, soft2, origin, root_side, *,
                  mesh_level: int, split_cells: float, order: int = 2,
                  interlace: bool = False, mesh_ny: int = 0,
                  heavy_cap: int = 0, deconvolve: bool = True, kernel=None,
                  prev=None, switch: str = "exp4"):
    """Build the carried long-range mesh state for F_long subcycling.

    Returns ``(grids, dep_pos, dep_wmass, heavy_mask)``:

    * ``grids`` — tuple of one (or two, with ``interlace``) PACKED
      interpolation tables (:func:`_interp_table` of the
      :func:`_mesh_grids_one` force windows): packing once per refresh
      leaves only the per-body row gather on the per-step path. With
      ``prev`` (the previous refresh's ``grids``), each table carries
      ``[T | ΔT]`` in 4K lanes, where ΔT = T − T_prev over one refresh
      interval: the per-step interpolation then EXTRAPOLATES
      ``T + (age/M)·ΔT``, cancelling the first-order-in-time staleness
      error (measured ~10x/step-of-age for the plain stale table at
      N=100k) for one fused multiply on the gathered rows — the deposit
      + FFT still run once per interval. Pass ``prev=None`` for a plain
      2K-lane table (no extrapolation; also the seed state, where ΔT=0
      but the 4K layout is kept for carry-structure stability — pass
      ``prev="zero"``);
    * ``dep_pos`` — the positions the deposit saw (for the stale-step
      self-term subtraction);
    * ``dep_wmass`` — the per-body mass actually deposited (alive-zeroed,
      heavies excluded);
    * ``heavy_mask`` — (n,) bool marking the ``heavy_cap`` heaviest alive
      bodies, which are EXCLUDED from the deposit and must instead get
      their F_long from :func:`_heavy_direct` each step.

    Why heavies leave the mesh: a body interpolating a STALE grid feels its
    own deposited image at displacement δ = x_now − x_dep — a spurious
    self-force ∝ m·K_long(δ). For satellite masses (~1) that is ~1e-4 of
    their real acceleration, but for the reference's 50 000-mass disk
    centers (Config.kt CENTRAL_MASS) it exceeds their real acceleration by
    orders of magnitude within one step. Exact direct summation of the few
    heaviest bodies (classic P3M heavy-particle treatment) removes the
    artifact at its source AND makes the dominant force component exact —
    N x heavy_cap dense pair math, ~0.2 ms at N=1M, H=16.
    """
    dtype = spos.dtype
    nw, ny, grid, _, h, a, morigin = _pm_geometry(
        origin, root_side, mesh_level, mesh_ny, split_cells, dtype)
    del a
    smass_w = jnp.where(salive, smass, jnp.zeros_like(smass))
    cap = spos.shape[0]
    if heavy_cap:
        key = jnp.where(salive, smass_w, -jnp.ones_like(smass_w))
        kv, hidx = jax.lax.top_k(key, heavy_cap)
        heavy_mask = (jnp.zeros((cap,), bool)
                      .at[hidx].set(kv > -0.5, mode="drop"))
    else:
        heavy_mask = jnp.zeros((cap,), bool)
    dep_wmass = jnp.where(heavy_mask, jnp.zeros_like(smass_w), smass_w)
    if kernel is None:
        a_ = split_cells * h
        kernel = _kernel_hats(grid, h, soft2, a_, dtype,
                              grid_y=2 * ny if ny != nw else None,
                              deconv_order=order if deconvolve else 0,
                              switch=switch)
    def table(origin_, prev_tab):
        fx, fy = _mesh_grids_one(spos, dep_wmass, origin_, h, nw, grid,
                                 order, kernel, ny=ny)
        t = _interp_table(fx, fy, nw, order, ny=ny)
        if prev_tab is None:
            return t
        lanes = t.shape[1]
        if isinstance(prev_tab, str):        # "zero": seed, ΔT = 0
            return jnp.concatenate([t, jnp.zeros_like(t)], axis=1)
        return jnp.concatenate([t, t - prev_tab[:, :lanes]], axis=1)

    prev0 = prev if prev is None or isinstance(prev, str) else prev[0]
    grids = (table(morigin, prev0),)
    if interlace:
        prev1 = prev if prev is None or isinstance(prev, str) else prev[1]
        grids = grids + (table(morigin - 0.5 * h, prev1),)
    return grids, spos, dep_wmass, heavy_mask


def _self_term(spos, dep_pos, dep_wmass, soft2, a, switch="exp4"):
    """Analytic stale-grid self-force cancellation (per body, O(n)).

    A body interpolating a stale grid feels its own deposited image:
    ≈ −m_dep·δ·lf(δ)/(|δ|²+ε²)^1.5 with δ = x_now − x_dep (attraction
    toward its old position; the deconvolved grid kernel ≈ the continuum
    K_long). Returning +m_dep·δ·lf·inv³ cancels it to leading order. Zero
    by construction at refresh steps (δ = 0) and quartically suppressed for
    |δ| ≪ a by the (r/a)^4 switch.
    """
    d = spos - dep_pos
    r2 = jnp.sum(d * d, axis=1)
    inv = jax.lax.rsqrt(r2 + soft2)
    w = dep_wmass * (inv * inv * inv)
    w = w * (1.0 - _short_weight(r2, a, switch))
    return w[:, None] * d


def _heavy_direct(spos, smass, salive, heavy_mask, soft2, a, heavy_cap,
                  switch="exp4"):
    """Exact F_long from the ``heavy_cap`` masked heavy bodies, fresh.

    Dense (n x heavy_cap) pair math at current positions — the heavies'
    long-range force never goes stale and never touches the grid (their
    short-range part rides the band/rescue passes like everyone else's,
    because only the DEPOSIT excluded them). Self-pairs vanish exactly
    (K_long(0) = 0).
    """
    key = jnp.where(heavy_mask, smass, -jnp.ones_like(smass))
    kv, hidx = jax.lax.top_k(key, heavy_cap)
    valid = (kv > -0.5) & salive[hidx]
    hp = spos[hidx]
    hm = jnp.where(valid, smass[hidx], 0.0)
    dx = spos[:, 0:1] - hp[None, :, 0]          # (n, H)
    dy = spos[:, 1:2] - hp[None, :, 1]
    r2 = dx * dx + dy * dy
    inv = jax.lax.rsqrt(r2 + soft2)
    w = hm[None, :] * (inv * inv * inv)
    w = w * (1.0 - _short_weight(r2, a, switch))
    return -jnp.stack([jnp.sum(w * dx, axis=1),
                       jnp.sum(w * dy, axis=1)], axis=-1)


def pm_accel_sorted(spos, smass, salive, G, soft2, origin, root_side, *,
                    mesh_level: int, split_cells: float, band: int,
                    chunk: int, order: int = 2, interlace: bool = False,
                    rescue_k: int = 0, rescue_k_hot: int = 0,
                    rescue_hot_cap: int = 128, mesh_ny: int = 0,
                    deconvolve: bool = True, kernel=None,
                    mesh_state=None, heavy_cap: int = 0,
                    self_correct: bool = True, stale_frac=None,
                    switch: str = "exp4"):
    """P3M acceleration in the Hilbert-SORTED frame: (n, 2) -> (n, 2).

    The body arrays must already be in Hilbert order over the root quad
    (``_hilbert_sort``); the returned acceleration is in the same order.
    Splitting this out of :func:`pm_accel` lets a step loop keep its state
    permanently sorted (integrate/merge are order-agnostic) and pay the
    36 ms argsort + 19 ms unsort gather (N=1M) once per resort interval
    instead of once per force pass — the round-2 per-phase table's largest
    self-inflicted cost. Returns ``(acc_sorted, (rescue_need, hot_count,
    mesh_oob))``.

    ``mesh_ny``: rectangular mesh — the world grid keeps nw = 2^mesh_level
    columns over the root quad's x extent but only ``mesh_ny`` rows of the
    same cell size, VERTICALLY CENTERED on the root center (the reference
    world is 3x wider than tall; a square mesh wastes most rows). Bodies
    outside the y window clamp to the edge rows (the same bounded
    approximation out-of-root bodies always got) and are counted in the
    ``mesh_oob`` stat so callers can detect a mis-sized window.

    ``mesh_state``: a carried :func:`pm_mesh_state` result — skips the
    deposit + FFT and interpolates the (possibly STALE) grids at the
    CURRENT positions instead, plus the stale self-term cancellation
    (``self_correct``) and the fresh heavy-direct sum. This is the F_long
    subcycling fast path: the long-range field evolves on the bulk
    dynamical timescale, so the grids can be refreshed every K steps while
    band + rescue (the fast-changing short-range physics) stay per-step.
    ``heavy_cap`` must match the value the state was built with.
    """
    dtype = spos.dtype
    nw, ny, grid, _, h, a, morigin = _pm_geometry(
        origin, root_side, mesh_level, mesh_ny, split_cells, dtype)
    smass = jnp.where(salive, smass, 0.0)
    mesh_oob = jnp.int32(0)
    if ny != nw:
        sy = (spos[:, 1] - morigin[1]) / h
        mesh_oob = jnp.sum(salive & ((sy < 0.0) | (sy >= ny))
                           ).astype(jnp.int32)

    if mesh_state is None and heavy_cap == 0:
        # Fresh full pass, everyone on the mesh (the default path).
        if kernel is None:
            kernel = _kernel_hats(grid, h, soft2, a, dtype, grid_y=2 * ny,
                                  deconv_order=order if deconvolve else 0,
                                  switch=switch)
        acc_mesh = _mesh_force(spos, smass, morigin, h, nw, grid, soft2, a,
                               order, kernel, ny=ny)
        if interlace:
            acc_mesh = 0.5 * (acc_mesh + _mesh_force(
                spos, smass, morigin - 0.5 * h, h, nw, grid, soft2, a, order,
                kernel, ny=ny))
    else:
        # Subcycled / heavy-direct path: F_long from (possibly stale)
        # carried grids + fresh analytic heavy sum + stale self-term
        # cancellation. With mesh_state=None the state is built fresh here
        # (heavy_cap > 0 without subcycling: pure accuracy upgrade — the
        # dominant heavy force component becomes exact).
        if mesh_state is None:
            mesh_state = pm_mesh_state(
                spos, smass, salive, soft2, origin, root_side,
                mesh_level=mesh_level, split_cells=split_cells, order=order,
                interlace=interlace, mesh_ny=mesh_ny, heavy_cap=heavy_cap,
                deconvolve=deconvolve, kernel=kernel, switch=switch)
        grids, dep_pos, dep_wmass, heavy_mask = mesh_state
        base, w = _cic_cells(spos, morigin, h, nw, order, ny=ny)
        acc_mesh = _interp_rows(grids[0], base, w, frac=stale_frac)
        if interlace:
            base2, w2 = _cic_cells(spos, morigin - 0.5 * h, h, nw, order,
                                   ny=ny)
            acc_mesh = 0.5 * (acc_mesh + _interp_rows(grids[1], base2, w2,
                                                      frac=stale_frac))
        if self_correct:
            acc_mesh = acc_mesh + _self_term(spos, dep_pos, dep_wmass,
                                             soft2, a, switch=switch)
        if heavy_cap:
            acc_mesh = acc_mesh + _heavy_direct(spos, smass, salive,
                                                heavy_mask, soft2, a,
                                                heavy_cap, switch=switch)

    acc_short = _band_short_range(spos, smass, soft2, a, band=band,
                                  chunk=chunk, switch=switch)
    rescue_need = jnp.int32(0)
    hot_count = jnp.int32(0)
    if rescue_k:
        acc_r, rescue_need, hot_count = _block_rescue(
            spos, smass, salive, soft2, a, band=band, k=rescue_k,
            chunk=chunk, k_hot=rescue_k_hot, hot_cap=rescue_hot_cap,
            switch=switch)
        acc_short = acc_short + acc_r

    acc = (acc_mesh + acc_short) * salive[:, None].astype(dtype)
    return G * acc, (rescue_need, hot_count, mesh_oob)


@functools.partial(jax.jit, static_argnames=("mesh_level", "split_cells",
                                              "band", "chunk", "order",
                                              "interlace", "rescue_k",
                                              "rescue_k_hot",
                                              "rescue_hot_cap", "mesh_ny",
                                              "deconvolve", "return_stats",
                                              "heavy_cap", "switch"))
def pm_accel(pos, mass, alive, G, soft2, origin, root_side, *,
             mesh_level: int, split_cells: float, band: int, chunk: int,
             order: int = 2, interlace: bool = False, rescue_k: int = 0,
             rescue_k_hot: int = 0, rescue_hot_cap: int = 128,
             mesh_ny: int = 0, deconvolve: bool = True,
             return_stats: bool = False, kernel=None, heavy_cap: int = 0,
             switch: str = "exp4"):
    """P3M acceleration, original body order. (n, 2) -> (n, 2).

    mesh_level: world grid is 2^level x 2^level over the root quad; the FFT
    grid is twice that (zero padding for a linear convolution).
    split_cells: short/long split radius ``a`` in units of the cell size.
    band: Hilbert-order half-window for the short-range sum.
    order: mass-assignment order — 2 = CIC (4 cells/body, default),
    1 = NGP (1 cell/body: ~2x fewer scatter/gather passes, extra O(h/a)
    mesh noise).
    interlace: average a second mesh pass on a half-cell-shifted grid —
    cancels leading-order assignment aliasing. Measured effect on the galaxy
    scene is modest (mean error -10-15% at ~2x mesh cost); the residual error
    is dominated by the split-region (r ~ a) kernel quantization, not
    aliasing.
    rescue_k: when > 0, run the :func:`_block_rescue` pass with up to this
    many partner blocks per block — exact recovery of short-range pairs the
    Hilbert band misses across curve discontinuities (see its docstring).
    return_stats: also return a stats dict (``rescue_need``: max partner
    blocks any block required; coverage is exact iff <= rescue_k).
    deconvolve: bake the Ŵ⁻² assignment-window sharpening into the spectral
    kernel (see :func:`_assignment_deconv`; measured 2.4x lower mean force
    error at N=1M). Only consulted when ``kernel`` is None — a precomputed
    kernel carries its own deconvolution choice.
    kernel: optional precomputed :func:`kernel_hats_for` result; when None
    the kernel FFTs are recomputed per call (fine for one-shot use, wasteful
    inside a step loop).
    heavy_cap: when > 0, the heavy_cap heaviest alive bodies are EXCLUDED
    from the mesh and their F_long is summed exactly instead
    (:func:`_heavy_direct`) — the dominant heavy force component becomes
    exact. Required for F_long subcycling (see :func:`pm_mesh_state`); a
    pure accuracy upgrade on fresh passes too.
    """
    spos, smass, salive, unsort = _hilbert_sort(pos, mass, alive, origin,
                                                root_side)
    acc, (rescue_need, hot_count, mesh_oob) = pm_accel_sorted(
        spos, smass, salive, G, soft2, origin, root_side,
        mesh_level=mesh_level, split_cells=split_cells, band=band,
        chunk=chunk, order=order, interlace=interlace, rescue_k=rescue_k,
        rescue_k_hot=rescue_k_hot, rescue_hot_cap=rescue_hot_cap,
        mesh_ny=mesh_ny, deconvolve=deconvolve, kernel=kernel,
        heavy_cap=heavy_cap, switch=switch)
    out = acc[unsort]
    if return_stats:
        return out, {"rescue_need": rescue_need, "rescue_hot": hot_count,
                     "mesh_oob": mesh_oob}
    return out
