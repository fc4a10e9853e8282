"""Round-5 roofline-headroom experiments (run on the TPU).

VERDICT r4 item 3: the bench roofline says force interp runs at 44% of
its row-gather ceiling (23.6 vs 10.5 ms), block rescue at 58% (21.0 vs
12.1) and band at 58% (7.8 vs 4.5) — ~27 ms/step of measured headroom at
N=1M. Each experiment isolates one phase at the exact bench shapes
(N=1M two-disk scene, lvl 12, ny=2048, split 2.5h, band 128, k=8):

``interp``  — where the 23.6 ms goes (table build vs row gather) and
             cheaper constructions: transpose-major build, fused
             build-from-potential-window, 16-lane [T|dT] gather.
``rescue``  — the exact top_k over (cb, B=8192) block scores vs
             (a) jax.lax.approx_max_k, (b) a two-stage exact top-k
             (top-k per 1024-lane group, then top-k of the 8*k
             survivors), (c) bf16 scores; plus need-agreement checks.
``switch``  — replace the exp(-(r/a)^4) short/long switch with a
             compactly-supported polynomial (s = r2/(2a)^2;
             w = (1-s)^4 for s<1): ~6x fewer VPU ops per pair in band +
             rescue. The spectral kernel is resampled with the SAME
             switch so the split stays exact; reports end-to-end pm
             force accuracy vs the exact all-pairs sum at N=1M and the
             band/rescue phase times under both switches.
``heavy``   — fresh-pass accuracy of pm_heavy_cap in {0, 16, 64} at
             N=1M (the heavy-direct sum makes the dominant force
             component exact; measured 2.7e-4 vs 3.9e-4 at N=100k in
             tools/subcycle_probe.py — this is the bench-scale point).

Timing discipline per PERFORMANCE.md: chained varying inputs, one host
value pull at the end; big arrays as jit ARGUMENTS (closure constants of
this size are unimplemented on the tunnel compiler).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_nbody.config import SimConfig
from tpu_nbody.models import scenes
from tpu_nbody.ops import forces, mesh as mesh_ops

LVL = 12
NY = 2048
SPLIT = 2.5
BAND = 128
RESCUE_K = 8
CHUNK = 16384


def chained_time(fn, iters: int, label: str):
    s = jnp.float32(1.000001)
    s = fn(s)
    float(s)
    s = fn(s * 1.000001)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:9.2f} ms", flush=True)
    return dt


def make_scene(n):
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(capacity=cap, max_depth=14, mesh_level=LVL, mesh_ny=NY,
                    mesh_split=SPLIT, mesh_band=BAND, mesh_rescue=RESCUE_K,
                    mesh_chunk=min(CHUNK, cap))
    n2 = n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[:n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[:n].set(m)
    alive = jnp.arange(cap) < n
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    return cfg, origin, side, pos, mass, alive, cap


def sorted_frame(pos, mass, alive, origin, side):
    spos, smass, salive, unsort = jax.jit(mesh_ops._hilbert_sort)(
        pos, mass, alive, origin, side)
    jax.block_until_ready(spos)
    return spos, smass, salive, unsort


# ---------------------------------------------------------------- interp

def exp_interp(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, _ = sorted_frame(pos, mass, alive, origin, side)
    nw = 1 << LVL
    ny = NY
    h = side / nw
    my, mx = ny + 1, nw + 1
    fwin = (jnp.arange(my * mx, dtype=jnp.float32).reshape(my, mx) * 1e-9)
    # a realistic potential FD window (what _mesh_grids_one consumes)
    pww = (jnp.arange((ny + 7) * (nw + 7), dtype=jnp.float32)
           .reshape(ny + 7, nw + 7) * 1e-9)
    print(f"# interp n={n} ny={ny} (bench shapes)", flush=True)

    @jax.jit
    def ph_cells(sp, s):
        base, w = mesh_ops._cic_cells(sp + s * 1e-6, origin, h, nw, 2, ny=ny)
        return base[0].astype(jnp.float32) + w[0, 0] + s

    @jax.jit
    def ph_tbuild(fx0, s):
        F = mesh_ops._interp_table(fx0 + s * 1e-6, fx0, nw, 2, ny=ny)
        return F[0, 0] + s

    @jax.jit
    def ph_tbuild_tmaj(fx0, s):
        # build (8, ny, nw) then one explicit transpose to (ny, nw, 8):
        # routes the interleave through XLA's transpose emitter instead of
        # a strided fused write
        fx = fx0 + s * 1e-6
        fy = fx0
        sl = lambda gz, dy, dx: jax.lax.dynamic_slice(gz, (dy, dx), (ny, nw))
        F = jnp.stack([sl(fx, 0, 0), sl(fy, 0, 0), sl(fx, 0, 1),
                       sl(fy, 0, 1), sl(fx, 1, 0), sl(fy, 1, 0),
                       sl(fx, 1, 1), sl(fy, 1, 1)], axis=0)
        F = jnp.transpose(F, (1, 2, 0)).reshape(ny * nw, 8)
        return F[0, 0] + s

    @jax.jit
    def ph_tbuild_pw(pw, s):
        # fused: table lanes straight from the potential window (no fx/fy
        # intermediates) — lane(oy,ox,c) = FD-gradient expression sliced at
        # the (oy, ox) cell offset
        p = pw + s * 1e-6
        c1 = 45.0 / (60.0 * h)
        c2 = 9.0 / (60.0 * h)
        c3 = 1.0 / (60.0 * h)

        def fx_at(oy, ox):
            return (c1 * (p[3 + oy:3 + oy + ny, 4 + ox:4 + ox + nw]
                          - p[3 + oy:3 + oy + ny, 2 + ox:2 + ox + nw])
                    - c2 * (p[3 + oy:3 + oy + ny, 5 + ox:5 + ox + nw]
                            - p[3 + oy:3 + oy + ny, 1 + ox:1 + ox + nw])
                    + c3 * (p[3 + oy:3 + oy + ny, 6 + ox:6 + ox + nw]
                            - p[3 + oy:3 + oy + ny, 0 + ox:0 + ox + nw]))

        def fy_at(oy, ox):
            return (c1 * (p[4 + oy:4 + oy + ny, 3 + ox:3 + ox + nw]
                          - p[2 + oy:2 + oy + ny, 3 + ox:3 + ox + nw])
                    - c2 * (p[5 + oy:5 + oy + ny, 3 + ox:3 + ox + nw]
                            - p[1 + oy:1 + oy + ny, 3 + ox:3 + ox + nw])
                    + c3 * (p[6 + oy:6 + oy + ny, 3 + ox:3 + ox + nw]
                            - p[0 + oy:0 + oy + ny, 3 + ox:3 + ox + nw]))

        F = jnp.stack([fx_at(0, 0), fy_at(0, 0), fx_at(0, 1), fy_at(0, 1),
                       fx_at(1, 0), fy_at(1, 0), fx_at(1, 1), fy_at(1, 1)],
                      axis=-1)
        return F.reshape(ny * nw, 8)[0, 0] + s

    base0, w0 = jax.jit(
        lambda sp: mesh_ops._cic_cells(sp, origin, h, nw, 2, ny=ny))(spos)
    F8 = jnp.zeros((ny * nw, 8), jnp.float32)
    F16 = jnp.zeros((ny * nw, 16), jnp.float32)
    jax.block_until_ready((base0, F8, F16))

    @jax.jit
    def ph_rows8(F, s):
        acc = mesh_ops._interp_rows(F + s * 1e-6, base0, w0)
        return acc[0, 0] + s

    @jax.jit
    def ph_rows16(F, s):
        acc = mesh_ops._interp_rows(F + s * 1e-6, base0, w0,
                                    frac=jnp.float32(0.5))
        return acc[0, 0] + s

    @jax.jit
    def ph_full(sp, fx0, s):
        base, w = mesh_ops._cic_cells(sp + s * 1e-6, origin, h, nw, 2, ny=ny)
        acc = mesh_ops._interp_packed(fx0 + s * 1e-6, fx0, base, w, nw, ny=ny)
        return acc[0, 0] + s

    it = args.iters
    chained_time(lambda s: ph_cells(spos, s), it, "cic_cells only")
    chained_time(lambda s: ph_tbuild(fwin, s), it, "table build (current)")
    chained_time(lambda s: ph_tbuild_tmaj(fwin, s), it,
                 "table build transpose-major")
    chained_time(lambda s: ph_tbuild_pw(pww, s), it,
                 "table build fused-from-pw")
    chained_time(lambda s: ph_rows8(F8, s), it, "(n,8) gather + weight")
    chained_time(lambda s: ph_rows16(F16, s), it,
                 "(n,16) [T|dT] gather + extrap")
    chained_time(lambda s: ph_full(spos, fwin, s), it,
                 "full interp (current)")


# ---------------------------------------------------------------- rescue

def _rescue_variant(spos, smass, salive, soft2, a, *, band, k, chunk,
                    topk_impl):
    """_block_rescue with a pluggable partner-selection implementation."""
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
        bb = jax.lax.dynamic_slice(bbox, (b0, 0), (cb, 4))
        gx = jnp.maximum(0.0, jnp.maximum(bb[:, 0:1] - bmaxx[None, :],
                                          bminx[None, :] - bb[:, 1:2]))
        gy = jnp.maximum(0.0, jnp.maximum(bb[:, 2:3] - bmaxy[None, :],
                                          bminy[None, :] - bb[:, 3:4]))
        g2 = gx * gx + gy * gy
        near = g2 < rcut2
        dblk = jnp.abs((b0 + jnp.arange(cb))[:, None] - idx_all[None, :])
        mask = near & (dblk > 1)
        cnt = jnp.sum(mask, axis=1)
        score = jnp.where(mask, rcut2 - g2, 0.0)
        mval, midx = topk_impl(score, k)
        mval = (mval > 0).astype(dtype)
        part = Xb[midx].reshape(cb, k, S, 3)
        pm = part[..., 2] * mval[:, :, None]
        px = part[..., 0].reshape(cb, k * S)
        py = part[..., 1].reshape(cb, k * S)
        pm = pm.reshape(cb, k * S)
        ctr = jax.lax.dynamic_slice(Xb, (b0, 0), (cb, S * 3)) \
            .reshape(cb, S, 3)
        dx = px[:, None, :] - ctr[:, :, None, 0]
        dy = py[:, None, :] - ctr[:, :, None, 1]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = pm[:, None, :] * (inv * inv * inv)
        w = w * jnp.exp(-((r2 / (a * a)) ** 2))
        acc = jnp.stack([jnp.sum(w * dx, axis=2),
                         jnp.sum(w * dy, axis=2)], axis=-1)
        return acc, cnt

    acc, cnt_c = jax.lax.map(one_chunk, starts)
    acc = acc.reshape(n_chunks * cb * S, 2)
    need = jnp.max(cnt_c.reshape(n_chunks * cb)[:B])
    return acc[:cap], need


def _topk_exact(score, k):
    return jax.lax.top_k(score, k)


def _topk_approx(score, k):
    return jax.lax.approx_max_k(score, k)


def _topk_two_stage(score, k):
    # exact: top-k of each 1024-lane group, then top-k of the survivors
    cb, B = score.shape
    G = min(1024, B)
    ng = B // G
    sg = score.reshape(cb, ng, G)
    v1, i1 = jax.lax.top_k(sg, k)                     # (cb, ng, k)
    gidx = (jnp.arange(ng) * G)[None, :, None] + i1
    v1 = v1.reshape(cb, ng * k)
    gidx = gidx.reshape(cb, ng * k)
    v2, i2 = jax.lax.top_k(v1, k)                     # (cb, k)
    return v2, jnp.take_along_axis(gidx, i2, axis=1)


def _topk_bf16(score, k):
    v, i = jax.lax.top_k(score.astype(jnp.bfloat16), k)
    return v.astype(score.dtype), i


def exp_rescue(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, _ = sorted_frame(pos, mass, alive, origin, side)
    h = float(side) / (1 << LVL)
    a = SPLIT * h
    soft2 = jnp.float32(1.0)
    print(f"# rescue n={n} band={BAND} k={RESCUE_K} B={cap // BAND}",
          flush=True)

    variants = [("exact top_k (current)", _topk_exact),
                ("approx_max_k", _topk_approx),
                ("two-stage exact top_k", _topk_two_stage),
                ("bf16-score top_k", _topk_bf16)]
    accs = {}
    for name, impl in variants:
        @jax.jit
        def ph(sp, s, impl=impl):
            acc, need = _rescue_variant(
                sp + s * 1e-6, smass, salive, soft2, a, band=BAND,
                k=RESCUE_K, chunk=CHUNK, topk_impl=impl)
            return acc[0, 0] + need.astype(jnp.float32) * 1e-9 + s

        try:
            chained_time(lambda s: ph(spos, s), args.iters, name)
        except Exception as e:
            print(f"{name:40s} FAILED: {str(e)[:100]}", flush=True)
            continue

        @jax.jit
        def acc_of(sp, impl=impl):
            acc, need = _rescue_variant(
                sp, smass, salive, soft2, a, band=BAND, k=RESCUE_K,
                chunk=CHUNK, topk_impl=impl)
            return acc, need
        accs[name] = acc_of(spos)

    ref, ref_need = accs.pop("exact top_k (current)")
    refn = np.linalg.norm(np.asarray(ref), axis=1) + 1e-12
    for name, (acc, need) in accs.items():
        d = np.linalg.norm(np.asarray(acc - ref), axis=1) / refn
        print(f"  {name}: rel dev vs exact mean {d.mean():.2e} "
              f"p99 {np.percentile(d, 99):.2e} max {d.max():.2e} "
              f"need {int(need)} vs {int(ref_need)}", flush=True)


# ---------------------------------------------------------------- switch

def _kernel_hats_switch(grid, h, soft2, a, dtype, grid_y, deconv_order,
                        short_w):
    """mesh_ops._kernel_hats with a pluggable short-range switch weight."""
    gy = grid_y
    ix = jnp.arange(grid)
    off = jnp.where(ix <= grid // 2, ix, ix - grid).astype(dtype) * h
    iy = jnp.arange(gy)
    offy = jnp.where(iy <= gy // 2, iy, iy - gy).astype(dtype) * h
    dy = offy[:, None]
    dx = off[None, :]
    r2 = dx * dx + dy * dy
    inv = jax.lax.rsqrt(r2 + soft2) / (r2 + soft2)
    long_frac = 1.0 - short_w(r2, a)
    kx = -dx * inv * long_frac
    ky = -dy * inv * long_frac
    kx_hat = jnp.fft.rfft2(kx)
    ky_hat = jnp.fft.rfft2(ky)
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
                        -1j * (d6x * kx_hat + d6y * ky_hat) / safe, 0.0)
    d = mesh_ops._assignment_deconv(grid, gy, deconv_order, dtype)
    return kx_hat * d, ky_hat * d, phi_hat * d


def _w_exp4(r2, a):
    return jnp.exp(-((r2 / (a * a)) ** 2))


def _w_poly4(r2, a):
    s = r2 / (4.0 * a * a)
    return jnp.maximum(0.0, 1.0 - s) ** 4


def _band_like(spos, smass, soft2, a, band, chunk, short_w):
    cap = spos.shape[0]
    S = band
    nb = -(-cap // S)
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)
    fields = jnp.concatenate(
        [fields, jnp.zeros((nb * S - cap, 3), spos.dtype)])
    X = fields.reshape(nb, S, 3)
    Xp = jnp.concatenate([jnp.zeros((1, S, 3), spos.dtype), X,
                          jnp.zeros((1, S, 3), spos.dtype)])
    cb = max(1, min(nb, chunk // S))
    n_chunks = -(-nb // cb)
    Xp = jnp.concatenate([Xp, jnp.zeros((n_chunks * cb - nb, S, 3),
                                        spos.dtype)])
    starts = jnp.arange(n_chunks) * cb

    def one_chunk(b0):
        ctr = jax.lax.dynamic_slice(Xp, (b0 + 1, 0, 0), (cb, S, 3))
        left = jax.lax.dynamic_slice(Xp, (b0, 0, 0), (cb, S, 3))
        right = jax.lax.dynamic_slice(Xp, (b0 + 2, 0, 0), (cb, S, 3))
        part = jnp.concatenate([left, ctr, right], axis=1)
        dx = part[:, None, :, 0] - ctr[:, :, None, 0]
        dy = part[:, None, :, 1] - ctr[:, :, None, 1]
        mj = part[:, None, :, 2]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = mj * (inv * inv * inv)
        w = w * short_w(r2, a)
        return jnp.stack([jnp.sum(w * dx, axis=2),
                          jnp.sum(w * dy, axis=2)], axis=-1)

    acc = jax.lax.map(one_chunk, starts)
    return acc.reshape(n_chunks * cb * S, 2)[:cap]


def exp_switch(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, unsort = sorted_frame(pos, mass, alive, origin,
                                               side)
    nw = 1 << LVL
    ny = NY
    grid, grid_y = 2 * nw, 2 * ny
    h = side / nw
    a = SPLIT * float(h)
    soft2 = jnp.float32(1.0)
    G = 80.0
    oy2 = origin[1] + 0.5 * side - 0.5 * ny * h
    morigin = jnp.stack([origin[0], oy2])
    print(f"# switch n={n} split={SPLIT} band={BAND} k={RESCUE_K}",
          flush=True)

    # exact reference
    ref = forces.accel_allpairs(pos, jnp.where(alive, mass, 0.0), G, soft2,
                                implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    print("# exact reference done", flush=True)

    for name, short_w in [("exp4 (current)", _w_exp4),
                          ("poly4 (1-s)^4, s=r2/(2a)^2", _w_poly4)]:
        kern = jax.jit(lambda sw=short_w: _kernel_hats_switch(
            grid, h, soft2, a, jnp.float32, grid_y, 2, sw))()
        jax.block_until_ready(kern)

        def pm_force(sp, sm, sa, kern, short_w=short_w):
            # kern is a jit ARGUMENT: closure constants of this size are
            # unimplemented on the tunnel compiler (PERFORMANCE.md)
            acc_mesh = mesh_ops._mesh_force(sp, sm, morigin, h, nw, grid,
                                            soft2, a, 2, kern, ny=ny)
            acc_band = _band_like(sp, sm, soft2, a, BAND, CHUNK, short_w)
            # rescue with the matched switch
            accr, need = _block_rescue_switch(sp, sm, sa, soft2, a, BAND,
                                              RESCUE_K, CHUNK, short_w)
            acc = (acc_mesh + acc_band + accr) * sa[:, None]
            return G * acc, need

        accs, need = jax.jit(pm_force)(spos, smass, salive, kern)
        acc = np.asarray(accs)
        # compare in the sorted frame: sort the reference the same way
        from tpu_nbody.ops import morton
        refs = ref[np.asarray(jnp.argsort(morton.hilbert_codes(
            pos, origin, side, alive), stable=True))]
        sel = np.asarray(salive)
        rel = (np.linalg.norm(acc - refs, axis=-1)
               / (np.linalg.norm(refs, axis=-1) + 1e-9))[sel]
        print(f"  {name}: mean {rel.mean():.2e} p50 {np.median(rel):.2e} "
              f"p99 {np.percentile(rel, 99):.2e} (need {int(need)})",
              flush=True)

        @jax.jit
        def ph_band(sp, s, short_w=short_w):
            acc = _band_like(sp + s * 1e-6, smass, soft2, a, BAND, CHUNK,
                             short_w)
            return acc[0, 0] + s

        @jax.jit
        def ph_rescue(sp, s, short_w=short_w):
            acc, need = _block_rescue_switch(sp + s * 1e-6, smass, salive,
                                             soft2, a, BAND, RESCUE_K,
                                             CHUNK, short_w)
            return acc[0, 0] + s

        chained_time(lambda s: ph_band(spos, s), args.iters,
                     f"  band [{name}]")
        chained_time(lambda s: ph_rescue(spos, s), args.iters,
                     f"  rescue [{name}]")


def _block_rescue_switch(spos, smass, salive, soft2, a, band, k, chunk,
                         short_w):
    """_block_rescue with a pluggable switch weight (exact top_k)."""
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
        bb = jax.lax.dynamic_slice(bbox, (b0, 0), (cb, 4))
        gx = jnp.maximum(0.0, jnp.maximum(bb[:, 0:1] - bmaxx[None, :],
                                          bminx[None, :] - bb[:, 1:2]))
        gy = jnp.maximum(0.0, jnp.maximum(bb[:, 2:3] - bmaxy[None, :],
                                          bminy[None, :] - bb[:, 3:4]))
        g2 = gx * gx + gy * gy
        near = g2 < rcut2
        dblk = jnp.abs((b0 + jnp.arange(cb))[:, None] - idx_all[None, :])
        mask = near & (dblk > 1)
        cnt = jnp.sum(mask, axis=1)
        score = jnp.where(mask, rcut2 - g2, 0.0)
        mval, midx = jax.lax.top_k(score, k)
        mval = (mval > 0).astype(dtype)
        part = Xb[midx].reshape(cb, k, S, 3)
        pm = part[..., 2] * mval[:, :, None]
        px = part[..., 0].reshape(cb, k * S)
        py = part[..., 1].reshape(cb, k * S)
        pm = pm.reshape(cb, k * S)
        ctr = jax.lax.dynamic_slice(Xb, (b0, 0), (cb, S * 3)) \
            .reshape(cb, S, 3)
        dx = px[:, None, :] - ctr[:, :, None, 0]
        dy = py[:, None, :] - ctr[:, :, None, 1]
        r2 = dx * dx + dy * dy
        inv = jax.lax.rsqrt(r2 + soft2)
        w = pm[:, None, :] * (inv * inv * inv)
        w = w * short_w(r2, a)
        acc = jnp.stack([jnp.sum(w * dx, axis=2),
                         jnp.sum(w * dy, axis=2)], axis=-1)
        return acc, cnt

    acc, cnt_c = jax.lax.map(one_chunk, starts)
    acc = acc.reshape(n_chunks * cb * S, 2)
    need = jnp.max(cnt_c.reshape(n_chunks * cb)[:B])
    return acc[:cap], need


# ---------------------------------------------------------------- heavy

def exp_heavy(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    soft2 = jnp.float32(1.0)
    G = 80.0
    ref = forces.accel_allpairs(pos, jnp.where(alive, mass, 0.0), G, soft2,
                                implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    print(f"# heavy n={n} (fresh-pass accuracy, bench config)", flush=True)
    kern = mesh_ops.kernel_hats_for(side, soft2, mesh_level=LVL,
                                    split_cells=SPLIT, mesh_ny=NY)
    sel = np.asarray(alive)
    for H in args.heavies:
        @jax.jit
        def f(p, m, al, H=H):
            return mesh_ops.pm_accel(p, m, al, G, soft2, origin, side,
                                     mesh_level=LVL, split_cells=SPLIT,
                                     band=BAND, chunk=CHUNK,
                                     rescue_k=RESCUE_K, mesh_ny=NY,
                                     kernel=kern, heavy_cap=H)
        acc = np.asarray(f(pos, mass, alive))
        rel = (np.linalg.norm(acc - ref, axis=-1)
               / (np.linalg.norm(ref, axis=-1) + 1e-9))[sel]
        print(f"  heavy_cap={H:4d}: mean {rel.mean():.2e} "
              f"p50 {np.median(rel):.2e} p99 {np.percentile(rel, 99):.2e}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["interp", "rescue", "switch", "heavy"])
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--heavies", type=int, nargs="+", default=[0, 16, 64])
    args = ap.parse_args()
    {"interp": exp_interp, "rescue": exp_rescue, "switch": exp_switch,
     "heavy": exp_heavy}[args.exp](args)


if __name__ == "__main__":
    main()
