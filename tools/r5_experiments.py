"""Round-5 (this round) P3M experiments: push N=1M under ~125 ms.

Current bench point (BENCH_r02 lineage): lvl 12 / CIC-deconvolved kernel /
split=3 / band=256 / rescue k=8 -> 133 ms/step, mean force err 1.62e-4 —
2.2x TIGHTER than the BH theta=0.5 point (3.6e-4) the BASELINE metric
names. That accuracy surplus is spendable: these sweeps find the cheapest
config that stays comfortably under 3.6e-4.

Experiments:

- ``acc``: accuracy sweep over (order, split, band, rescue_k) at the bench
  scene, all with the assignment-deconvolved kernel. order=1 (NGP) deposits
  1 scatter item/body instead of 4 and interpolates a 2-lane row instead of
  8 — the deposit pass is scatter-ITEM-bound (PERFORMANCE.md), so NGP is
  the one remaining "fewer items" lever if its aliasing noise stays under
  the target at lvl 12.
- ``time``: phase timings for deposit/interp at order 1 vs 2 and band/
  rescue at the candidate configs, same chained-salt discipline.

Usage: python tools/r5_experiments.py acc --n 1000000
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def chained_time(fn, iters: int, label: str):
    s = jnp.float32(1.000001)
    s = fn(s)
    float(s)
    s = fn(s * 1.000001)
    float(s)  # drain the 2nd warm-up before t0 (advisor: it bled into t0)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:9.2f} ms", flush=True)
    return dt


def make_scene(n):
    # tpu_nbody imports live here (not module top) so --cpu's platform
    # switch in main() runs before anything could touch a backend.
    from tpu_nbody.config import SimConfig
    from tpu_nbody.models import scenes

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


def exp_acc(args):
    from tpu_nbody.ops import forces, mesh as mesh_ops

    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    G, soft2 = 80.0, 1.0
    ref = forces.accel_allpairs(pos, mass, G, soft2, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    refn = np.linalg.norm(ref, axis=-1)
    sel = np.asarray(alive)
    ny = args.ny
    lvl = args.level
    print(f"# acc sweep n={n} lvl={lvl} ny={ny} (deconvolved kernels)")
    print(f"{'ord:a:band:k':>18s} {'mean':>10s} {'p50':>10s} {'p99':>10s}",
          flush=True)
    for order in args.orders:
        for split in args.splits:
            kern = mesh_ops.kernel_hats_for(
                side, jnp.float32(soft2), mesh_level=lvl, split_cells=split,
                mesh_ny=ny, order=order, deconvolve=True)
            for band in args.bands:
                for resc in args.rescues:
                    acc = np.asarray(mesh_ops.pm_accel(
                        pos, mass, alive, G, jnp.float32(soft2), origin,
                        side, mesh_level=lvl, split_cells=split, band=band,
                        chunk=16384, rescue_k=resc, mesh_ny=ny, order=order,
                        interlace=args.interlace, kernel=kern))
                    rel = (np.linalg.norm(acc - ref, axis=-1)
                           / (refn + 1e-9))[sel]
                    tag = f"{order}:{split}:{band}:{resc}" \
                        + ("i" if args.interlace else "")
                    print(f"{tag:>18s} "
                          f"{rel.mean():10.2e} {np.median(rel):10.2e} "
                          f"{np.percentile(rel, 99):10.2e}", flush=True)


def exp_time(args):
    from tpu_nbody.ops import mesh as mesh_ops

    n = args.n
    cfg, origin, side, pos, mass, alive, cap = make_scene(n)
    spos, smass, salive, _ = mesh_ops._hilbert_sort(pos, mass, alive,
                                                    origin, side)
    lvl = args.level
    nw = 1 << lvl
    ny = args.ny or nw
    grid = 2 * nw
    grid_y = 2 * ny
    h = side / nw
    soft2 = jnp.float32(1.0)
    jax.block_until_ready(spos)
    print(f"# time n={n} lvl={lvl} ny={ny}", flush=True)

    def make_deposit(order, window=False):
        @jax.jit
        def ph(s):
            base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw,
                                          order, ny=ny)
            rho = mesh_ops._deposit_packed(smass, base, w, nw, grid,
                                           run_compress=window,
                                           ny=ny, grid_y=grid_y)
            return rho[0, 0] + jnp.sum(rho[0, :8]) + s
        return ph

    # non-constant fill: a constant-zero operand invites XLA simplifications
    # the production FFT-derived grids don't get (advisor finding)
    fwin = (jnp.arange((ny + 1) * (nw + 1), dtype=jnp.float32)
            .reshape(ny + 1, nw + 1) * 1e-9)

    def make_interp(order):
        @jax.jit
        def ph(s):
            base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw,
                                          order, ny=ny)
            acc = mesh_ops._interp_packed(fwin + s * 1e-6, fwin, base, w,
                                          nw, ny=ny)
            return acc[0, 0] + s
        return ph

    def make_band(band, split):
        a = split * float(h)

        @jax.jit
        def ph(s):
            acc = mesh_ops._band_short_range(spos + s * 1e-6, smass, soft2,
                                             a, band=band, chunk=16384)
            return acc[0, 0] + s
        return ph

    def make_rescue(band, split, k):
        a = split * float(h)

        @jax.jit
        def ph(s):
            acc2, need, hot = mesh_ops._block_rescue(
                spos + s * 1e-6, smass, salive, soft2, a, band=band, k=k,
                chunk=16384)
            return acc2[0, 0] + need.astype(jnp.float32) * 1e-9 + s
        return ph

    chained_time(make_deposit(2), args.iters, "deposit CIC (order 2)")
    for W in args.windows:
        chained_time(make_deposit(2, window=W), args.iters,
                     f"deposit CIC window W={W}")
    chained_time(make_deposit(1), args.iters, "deposit NGP (order 1)")
    chained_time(make_interp(2), args.iters, "interp CIC (order 2)")
    chained_time(make_interp(1), args.iters, "interp NGP (order 1)")
    for band in args.bands:
        chained_time(make_band(band, args.splits[0]), args.iters,
                     f"band {band} a={args.splits[0]}h")
        for k in args.rescues:
            chained_time(make_rescue(band, args.splits[0], k), args.iters,
                         f"rescue band={band} k={k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["acc", "time"])
    ap.add_argument("--cpu", action="store_true",
                    help="run on the host CPU (accuracy is backend-"
                         "independent; use when the tunnel is down)")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--ny", type=int, default=2048)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--orders", type=int, nargs="+", default=[2, 1])
    ap.add_argument("--splits", type=float, nargs="+", default=[3.0])
    ap.add_argument("--bands", type=int, nargs="+", default=[256, 128])
    ap.add_argument("--rescues", type=int, nargs="+", default=[8, 6, 4])
    ap.add_argument("--windows", type=int, nargs="+", default=[],
                    help="time: also time deposit with run_compress=W "
                         "window pre-summing (same-cell RMW conflict "
                         "removal on the Hilbert-sorted stream)")
    ap.add_argument("--interlace", action="store_true",
                    help="acc: average a half-cell-shifted second mesh pass")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    {"acc": exp_acc, "time": exp_time}[args.exp](args)


if __name__ == "__main__":
    main()
