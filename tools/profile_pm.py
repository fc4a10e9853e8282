"""Per-phase profile of the P3M force pass (VERDICT round-2 item 2).

Times each phase of ``tpu_nbody.ops.mesh.pm_accel`` in isolation at the
bench scale, with the honest-timing discipline this backend requires
(PERFORMANCE.md): every call carries a salt scalar chained from the previous
call's output, so (executable, inputs) pairs are unique (no tunnel
memoization) and calls are sequentially dependent (no overlap); one host
value pull at the end of the chain.

Usage: python tools/profile_pm.py [--n 1000000] [--level 12] [--iters 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from tpu_nbody.config import SimConfig
from tpu_nbody.models import scenes
from tpu_nbody.ops import mesh as mesh_ops
from tpu_nbody.ops import morton


def chained_time(fn, iters: int, label: str):
    """fn(salt scalar) -> scalar. Returns ms/call over a chained loop."""
    s = jnp.float32(1.000001)
    s = fn(s)
    float(s)  # compile + complete
    s = fn(s * 1.000001)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:18s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--split", type=float, default=4.0)
    ap.add_argument("--band", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--ny", type=int, default=0)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap, mesh_level=args.level,
                    mesh_split=args.split, mesh_band=args.band,
                    mesh_chunk=args.chunk, mesh_ny=args.ny)
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half), jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    nw = 1 << cfg.mesh_level
    nyv = cfg.mesh_ny or nw
    grid = 2 * nw
    grid_y = 2 * nyv
    h = side / nw
    a = cfg.mesh_split * float(h)

    n2 = args.n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=args.n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[: args.n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[: args.n].set(m)
    alive = jnp.arange(cap) < args.n
    print(f"# n={args.n} cap={cap} level={cfg.mesh_level} grid={grid} "
          f"split={cfg.mesh_split} band={cfg.mesh_band} backend="
          f"{jax.default_backend()}")

    # ---- materialize the intermediate stages once (static inputs) ----
    spos, smass, salive, unsort = mesh_ops._hilbert_sort(
        pos, mass, alive, origin, side)
    kernel = mesh_ops.kernel_hats_for(side, jnp.float32(1.0),
                                      mesh_level=cfg.mesh_level,
                                      split_cells=cfg.mesh_split,
                                      mesh_ny=cfg.mesh_ny)
    rho_example = jnp.zeros((grid_y, grid), jnp.float32)
    fgrid_example = jnp.zeros((grid_y * grid // 4, 2), jnp.float32)
    jax.block_until_ready((spos, kernel))

    # ---- phase fns (salt perturbs a real input; returns a scalar) ----
    @jax.jit
    def ph_sort(s):
        sp, sm, sa, us = mesh_ops._hilbert_sort(pos + s * 1e-6, mass, alive,
                                                origin, side)
        return sp[0, 0] + sm[0] + us[0] + s

    def make_deposit(run_compress):
        @jax.jit
        def ph(s):
            base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw,
                                          2, ny=nyv)
            rho = mesh_ops._deposit_packed(smass, base, w, nw, grid,
                                           run_compress=run_compress,
                                           ny=nyv, grid_y=grid_y)
            return rho[0, 0] + jnp.sum(rho[0, :8]) + s
        return ph

    ph_deposit = make_deposit(False)

    @jax.jit
    def _fft(rho0, kern, s):
        rho = rho0 + s * 1e-6
        phi_hat = kern[2]
        rho_hat = jnp.fft.rfft2(rho)
        phi = jnp.fft.irfft2(rho_hat * phi_hat, s=(grid_y, grid))
        return phi[0, 0] + s

    def ph_fft(s):
        return _fft(rho_example, kernel, s)

    @jax.jit
    def ph_kernelhats(s):
        kx, ky, _ = mesh_ops._kernel_hats(grid, h, 1.0 + s * 1e-6, a,
                                       jnp.float32)
        return jnp.real(kx[0, 0]) + jnp.real(ky[0, 0]) + s

    @jax.jit
    def _interp(fx0, fy0, s):
        fx = fx0 + s * 1e-6
        fy = fy0 + s * 1e-6
        base, w = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2,
                                      ny=nyv)
        acc = mesh_ops._interp_packed(fx, fy, base, w, nw, ny=nyv)
        return acc[0, 0] + s

    fwin = jnp.zeros((nyv + 1, nw + 1), jnp.float32)

    def ph_interp(s):
        return _interp(fwin, fwin, s)

    @jax.jit
    def ph_band(s):
        acc = mesh_ops._band_short_range(spos + s * 1e-6, smass,
                                         jnp.float32(1.0), a,
                                         band=cfg.mesh_band,
                                         chunk=cfg.mesh_chunk)
        return acc[0, 0] + s

    def make_rescue(k, k_hot=0):
        @jax.jit
        def ph(s):
            sp = spos + s * 1e-6
            acc2, need, hot = mesh_ops._block_rescue(
                sp, smass, salive, jnp.float32(1.0), a, band=cfg.mesh_band,
                k=k, k_hot=k_hot, chunk=cfg.mesh_chunk)
            return (acc2[0, 0] + need.astype(jnp.float32) * 1e-9
                    + hot.astype(jnp.float32) * 1e-9 + s)
        return ph

    ph_rescue = make_rescue(4)

    @jax.jit
    def _unsort(fg0, s):
        acc = fg0 + s * 1e-6
        return acc[unsort][0, 0] + s

    def ph_unsort(s):
        return _unsort(fgrid_example, s)

    @jax.jit
    def _full(kern, s):
        acc = mesh_ops.pm_accel(pos + s * 1e-6, mass, alive, 80.0,
                                jnp.float32(1.0), origin, side,
                                mesh_level=cfg.mesh_level,
                                split_cells=cfg.mesh_split,
                                band=cfg.mesh_band, chunk=cfg.mesh_chunk,
                                mesh_ny=cfg.mesh_ny, kernel=kern)
        return acc[0, 0] + s

    @jax.jit
    def _full_rescue(kern, s):
        acc = mesh_ops.pm_accel(pos + s * 1e-6, mass, alive, 80.0,
                                jnp.float32(1.0), origin, side,
                                mesh_level=cfg.mesh_level,
                                split_cells=cfg.mesh_split,
                                band=cfg.mesh_band, chunk=cfg.mesh_chunk,
                                rescue_k=4, mesh_ny=cfg.mesh_ny,
                                kernel=kern)
        return acc[0, 0] + s

    def ph_full(s):
        return _full(kernel, s)

    total = 0.0
    total += chained_time(ph_sort, args.iters, "sort")
    total += chained_time(ph_deposit, args.iters, "deposit(plain)")
    chained_time(make_deposit(4), args.iters, "deposit(win4)")
    chained_time(make_deposit(8), args.iters, "deposit(win8)")
    chained_time(make_deposit(16), args.iters, "deposit(win16)")
    chained_time(make_rescue(12), args.iters, "rescue k=12")
    total += chained_time(ph_fft, args.iters, "fft(1r+1ir)")
    total += chained_time(ph_interp, args.iters, "interp(packed)")
    total += chained_time(ph_band, args.iters, "band short-range")
    total += chained_time(ph_rescue, args.iters, "rescue pass")
    total += chained_time(ph_unsort, args.iters, "unsort gather")
    print(f"{'sum of phases':18s} {total:9.2f} ms")
    chained_time(ph_kernelhats, args.iters, "kernel hats(once)")
    chained_time(ph_full, args.iters, "FULL pm_accel")
    chained_time(lambda s: _full_rescue(kernel, s), args.iters,
                 "FULL + rescue")


if __name__ == "__main__":
    main()
