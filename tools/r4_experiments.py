"""Round-4 P3M optimization experiments (run on the TPU).

Three experiment families toward cutting the N=1M step under ~125 ms
(>= 8M body-updates/s):

1. ``deconv``: CIC-deconvolution of the spectral kernel (classic P3M
   sharpening, Hockney & Eastwood ch.8): deposit and interpolation each
   convolve the point force with the CIC window W, so the mesh force
   between two bodies is (W*W*K) instead of K. Dividing the kernel hat by
   What(k)^2 (per-axis sinc^4 at the wrapped frequency) compensates
   exactly up to aliasing. PERFORMANCE.md pins the residual mesh error on
   exactly this smoothing ("CIC quantization of the kernel in the split
   region r ~ a"), so compensation should let the split radius a shrink
   from 6h to ~4h at equal accuracy — and the short-range pair volume
   (band + rescue, ~84 ms of the step) scales ~a^2.

2. ``pairops``: op-level cost of the short-range pair math: rsqrt+divide
   vs rsqrt^3 (mul), exp((r/a)^4) switch vs compact polynomial switch.

3. ``interp``: where _interp_packed's 30 ms goes (F-table build vs the
   (n, 8) row gather) and cheaper layouts.

Timing discipline per PERFORMANCE.md: chained varying inputs, one host
pull at the end.
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


def chained_time(fn, iters: int, label: str):
    s = jnp.float32(1.000001)
    s = fn(s)
    float(s)
    s = fn(s * 1.000001)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s} {dt:9.2f} ms", flush=True)
    return dt


def cic_deconv(grid, gy, power, dtype=jnp.float32):
    """1 / What^power on the rfft2 layout; What = per-axis sinc^2 (CIC) at
    the wrapped frequency. power=2 compensates deposit+interp."""
    qx = jnp.arange(grid // 2 + 1).astype(dtype)
    ax = jnp.sinc(qx / grid) ** 2
    qy = jnp.arange(gy)
    qyw = jnp.where(qy <= gy // 2, qy, qy - gy).astype(dtype)
    ay = jnp.sinc(qyw / gy) ** 2
    w = ax[None, :] * ay[:, None]
    return (1.0 / jnp.maximum(w, 1e-6)) ** power


def make_scene(n):
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(capacity=cap)
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    n2 = n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[:n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[:n].set(m)
    alive = jnp.arange(cap) < n
    return cfg, origin, side, pos, mass, alive, cap


def exp_deconv(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    G, soft2 = 80.0, 1.0
    ref = forces.accel_allpairs(pos, mass, G, soft2, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    refn = np.linalg.norm(ref, axis=-1)
    sel = np.asarray(alive)
    ny = args.ny
    bands = args.bands or [args.band]
    rescues = args.rescues or [args.rescue]
    print(f"# deconv sweep n={n} ny={ny}")
    print(f"{'a:deconv:band:k':>18s} {'mean':>10s} {'p50':>10s} "
          f"{'p99':>10s}")
    for split in args.splits:
        for power in args.powers:
            lvl = 12
            nw = 1 << lvl
            grid = 2 * nw
            gy = 2 * (ny or nw)
            kern = mesh_ops.kernel_hats_for(
                side, jnp.float32(soft2), mesh_level=lvl,
                split_cells=split, mesh_ny=ny)
            if power:
                d = cic_deconv(grid, gy, power)
                kern = (kern[0], kern[1], kern[2] * d)
            for band in bands:
                for resc in rescues:
                    acc = np.asarray(mesh_ops.pm_accel(
                        pos, mass, alive, G, jnp.float32(soft2), origin,
                        side, mesh_level=lvl, split_cells=split, band=band,
                        chunk=16384, rescue_k=resc, mesh_ny=ny,
                        kernel=kern))
                    rel = (np.linalg.norm(acc - ref, axis=-1)
                           / (refn + 1e-9))[sel]
                    print(f"{f'{split}:{power}:{band}:{resc}':>18s} "
                          f"{rel.mean():10.2e} {np.median(rel):10.2e} "
                          f"{np.percentile(rel, 99):10.2e}", flush=True)


def _pair_w_current(r2, soft2, a):
    return jax.lax.rsqrt(r2 + soft2) / (r2 + soft2) \
        * jnp.exp(-((r2 / (a * a)) ** 2))


def _pair_w_rsqrt3(r2, soft2, a):
    inv = jax.lax.rsqrt(r2 + soft2)
    return inv * inv * inv * jnp.exp(-((r2 / (a * a)) ** 2))


def _pair_w_poly(r2, soft2, a):
    # compact cubic switch in r^2: s = max(0, 1 - r2/(2a)^2)^3
    inv = jax.lax.rsqrt(r2 + soft2)
    s = jnp.maximum(0.0, 1.0 - r2 / (4.0 * a * a))
    return inv * inv * inv * (s * s * s)


def exp_pairops(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, _ = mesh_ops._hilbert_sort(pos, mass, alive,
                                                    origin, side)
    h = float(side) / (1 << 12)
    soft2 = jnp.float32(1.0)
    S = args.band
    k = args.rescue
    chunk = 16384
    jax.block_until_ready(spos)
    print(f"# pairops n={n} band={S} k={k}")

    def band_like(wfn):
        capn = spos.shape[0]
        nb = -(-capn // S)
        fields = jnp.concatenate([spos, smass[:, None]], axis=1)
        fields = jnp.concatenate(
            [fields, jnp.zeros((nb * S - capn, 3), jnp.float32)])
        X = fields.reshape(nb, S, 3)
        Xp = jnp.concatenate([jnp.zeros((1, S, 3), jnp.float32), X,
                              jnp.zeros((1, S, 3), jnp.float32)])
        cb = max(1, min(nb, chunk // S))
        n_chunks = -(-nb // cb)
        Xp = jnp.concatenate(
            [Xp, jnp.zeros((n_chunks * cb - nb, S, 3), jnp.float32)])
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
            w = mj * wfn(r2, soft2, a)
            return jnp.stack([jnp.sum(w * dx, axis=2),
                              jnp.sum(w * dy, axis=2)], axis=-1)

        acc = jax.lax.map(one_chunk, starts)
        return acc.reshape(n_chunks * cb * S, 2)[:capn]

    for aa in args.splits:
        a = aa * h
        for name, wfn in [("exp+div (current)", _pair_w_current),
                          ("exp+rsqrt3", _pair_w_rsqrt3),
                          ("poly+rsqrt3", _pair_w_poly)]:
            @jax.jit
            def ph(s, wfn=wfn, a=a):
                acc = band_like(lambda r2, s2, av: wfn(r2, s2, a))
                return acc[0, 0] + s + spos[0, 0] * 0
            # salt via closure won't vary inputs; instead perturb spos
            @jax.jit
            def ph2(s, wfn=wfn, a=a):
                sp = spos + s * 1e-6
                capn = sp.shape[0]
                nb = -(-capn // S)
                fields = jnp.concatenate([sp, smass[:, None]], axis=1)
                X = fields.reshape(nb, S, 3)
                Xp = jnp.concatenate([jnp.zeros((1, S, 3), jnp.float32), X,
                                      jnp.zeros((1, S, 3), jnp.float32)])
                cb = max(1, min(nb, chunk // S))
                n_chunks = -(-nb // cb)
                Xp = jnp.concatenate(
                    [Xp, jnp.zeros((n_chunks * cb - nb, S, 3), jnp.float32)])
                starts = jnp.arange(n_chunks) * cb

                def one_chunk(b0):
                    ctr = jax.lax.dynamic_slice(Xp, (b0 + 1, 0, 0),
                                                (cb, S, 3))
                    left = jax.lax.dynamic_slice(Xp, (b0, 0, 0), (cb, S, 3))
                    right = jax.lax.dynamic_slice(Xp, (b0 + 2, 0, 0),
                                                  (cb, S, 3))
                    part = jnp.concatenate([left, ctr, right], axis=1)
                    dx = part[:, None, :, 0] - ctr[:, :, None, 0]
                    dy = part[:, None, :, 1] - ctr[:, :, None, 1]
                    mj = part[:, None, :, 2]
                    r2 = dx * dx + dy * dy
                    w = mj * wfn(r2, soft2, a)
                    return jnp.stack([jnp.sum(w * dx, axis=2),
                                      jnp.sum(w * dy, axis=2)], axis=-1)

                acc = jax.lax.map(one_chunk, starts)
                return acc[0, 0, 0, 0] + s
            chained_time(ph2, args.iters, f"band a={aa}h {name}")


def exp_interp(args):
    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, _ = mesh_ops._hilbert_sort(pos, mass, alive,
                                                    origin, side)
    lvl = 12
    nw = 1 << lvl
    ny = args.ny or nw
    h = side / nw
    fwin = jnp.zeros((ny + 1, nw + 1), jnp.float32)
    jax.block_until_ready((spos, fwin))
    print(f"# interp n={n} ny={ny}")

    @jax.jit
    def ph_full(s):
        base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2,
                                      ny=ny)
        acc = mesh_ops._interp_packed(fwin + s * 1e-6, fwin, base, w, nw,
                                      ny=ny)
        return acc[0, 0] + s

    @jax.jit
    def ph_cells(s):
        base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2,
                                      ny=ny)
        return base[0].astype(jnp.float32) + w[0, 0] + s

    @jax.jit
    def ph_fbuild(s):
        fx = fwin + s * 1e-6
        fy = fwin
        sl = lambda gz, dy, dx: jax.lax.dynamic_slice(gz, (dy, dx), (ny, nw))
        F = jnp.stack([sl(fx, 0, 0), sl(fy, 0, 0), sl(fx, 0, 1),
                       sl(fy, 0, 1), sl(fx, 1, 0), sl(fy, 1, 0),
                       sl(fx, 1, 1), sl(fy, 1, 1)], axis=-1)
        return F.reshape(ny * nw, 8)[0, 0] + s

    base0, w0 = mesh_ops._cic_cells(spos, origin, h, nw, 2, ny=ny)
    F0 = jnp.zeros((ny * nw, 8), jnp.float32)
    jax.block_until_ready((base0, F0))

    @jax.jit
    def ph_gather_only(s):
        b = jnp.clip(base0 + (s * 0).astype(jnp.int32), 0, ny * nw - 1)
        rows = (F0 + s * 1e-6)[b]
        return rows[0, 0] + s

    @jax.jit
    def ph_weighted(s):
        rows = (F0 + s * 1e-6)[base0]
        w = w0 + s * 1e-6
        ax = (w[:, 0] * rows[:, 0] + w[:, 1] * rows[:, 2]
              + w[:, 2] * rows[:, 4] + w[:, 3] * rows[:, 6])
        ay = (w[:, 0] * rows[:, 1] + w[:, 1] * rows[:, 3]
              + w[:, 2] * rows[:, 5] + w[:, 3] * rows[:, 7])
        return ax[0] + ay[0] + s

    chained_time(ph_cells, args.iters, "cic_cells only")
    chained_time(ph_fbuild, args.iters, "F table build only")
    chained_time(ph_gather_only, args.iters, "(n,8) row gather only")
    chained_time(ph_weighted, args.iters, "gather + weighted sum")
    chained_time(ph_full, args.iters, "full interp (current)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["deconv", "pairops", "interp"])
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--ny", type=int, default=2048)
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--rescue", type=int, default=12)
    ap.add_argument("--bands", type=int, nargs="+", default=None)
    ap.add_argument("--rescues", type=int, nargs="+", default=None)
    ap.add_argument("--splits", type=float, nargs="+",
                    default=[4.0, 5.0, 6.0])
    ap.add_argument("--powers", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    {"deconv": exp_deconv, "pairops": exp_pairops,
     "interp": exp_interp}[args.exp](args)


if __name__ == "__main__":
    main()
