"""Round-3 PM optimization experiments (VERDICT r2 item 1).

Measures candidate replacements for the three self-inflicted costs the
round-2 per-phase table exposed (PERFORMANCE.md): CIC deposit (52 ms vs a
16 ms uniform floor), forward FFT of the all-zero padded half, and
lax.map dispatch overhead in the band/rescue passes. Honest-timing
discipline per PERFORMANCE.md: salt-chained calls, one host pull.

Usage: python tools/r3_experiments.py [--n 1000000] [--level 12]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from tpu_nbody.config import SimConfig
from tpu_nbody.models import scenes
from tpu_nbody.ops import mesh as mesh_ops


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
    print(f"{label:34s} {dt:9.2f} ms", flush=True)
    return dt


# ---------------------------------------------------------------- deposits
def deposit_run_combined(smass, base, w, nw, grid):
    """Run-combined plane scatter: Hilbert-sorted bodies sharing a cell are
    consecutive; pre-sum each run with cumsums and scatter one value per
    run end, routing the zeroed non-end slots to unique trash addresses so
    no scatter address sees more than a handful of writes.

    Per-run sums via cumsum differencing: vals nonneg -> cs monotone, so a
    running max of (cs[start-1] seeded at run starts) propagates each run's
    start offset forward without a segmented scan primitive.
    """
    n = smass.shape[0]
    dtype = smass.dtype
    is_end = jnp.concatenate([base[1:] != base[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), is_end[:-1]])
    tgt = jnp.where(is_end, base, nw * nw + jnp.arange(n, dtype=base.dtype))
    vals4 = smass[:, None] * w                               # (n, 4)
    cs4 = jnp.cumsum(vals4, axis=0)
    cs4_prev = jnp.concatenate([jnp.zeros((1, 4), dtype), cs4[:-1]])
    seed = jnp.where(is_start[:, None], cs4_prev, -jnp.inf)
    run_prev = jax.lax.associative_scan(jnp.maximum, seed, axis=0)
    out4 = jnp.where(is_end[:, None], cs4 - run_prev, 0.0)
    planes = [jnp.zeros((nw * nw + n,), dtype)
              .at[tgt].add(out4[:, k])[: nw * nw].reshape(nw, nw)
              for k in range(4)]
    world = (jnp.pad(planes[0], ((0, 1), (0, 1)))
             + jnp.pad(planes[1], ((0, 1), (1, 0)))
             + jnp.pad(planes[2], ((1, 0), (0, 1)))
             + jnp.pad(planes[3], ((1, 0), (1, 0))))
    rho = jnp.zeros((grid, grid), smass.dtype)
    return jax.lax.dynamic_update_slice(rho, world, (0, 0))


def deposit_sorted_scatter(smass, base, w, nw, grid):
    """Sort scatter items by base cell, scatter with indices_are_sorted."""
    order = jnp.argsort(base)
    b2 = base[order]
    planes = []
    for k in range(w.shape[1]):
        v = (smass * w[:, k])[order]
        planes.append(jnp.zeros((nw * nw,), smass.dtype)
                      .at[b2].add(v, indices_are_sorted=True)
                      .reshape(nw, nw))
    world = (jnp.pad(planes[0], ((0, 1), (0, 1)))
             + jnp.pad(planes[1], ((0, 1), (1, 0)))
             + jnp.pad(planes[2], ((1, 0), (0, 1)))
             + jnp.pad(planes[3], ((1, 0), (1, 0))))
    rho = jnp.zeros((grid, grid), smass.dtype)
    return jax.lax.dynamic_update_slice(rho, world, (0, 0))


def fft_trimmed(rho, phi_hat, nw, grid):
    """Forward transform skipping the all-zero padded rows: row rffts on
    the nw+2 occupied rows only, zero-extend, then full column FFT."""
    occ = nw + 2
    rh = jnp.fft.rfft(rho[:occ], axis=1)
    rh = jnp.pad(rh, ((0, grid - occ), (0, 0)))
    rho_hat = jnp.fft.fft(rh, axis=0)
    return jnp.fft.irfft2(rho_hat * phi_hat, s=(grid, grid))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--split", type=float, default=6.0)
    ap.add_argument("--band", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap, mesh_level=args.level,
                    mesh_split=args.split, mesh_band=args.band)
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    nw = 1 << cfg.mesh_level
    grid = 2 * nw
    h = side / nw
    a = cfg.mesh_split * float(h)

    n2 = args.n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=args.n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[: args.n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[: args.n].set(m)
    alive = jnp.arange(cap) < args.n
    print(f"# n={args.n} cap={cap} level={args.level} grid={grid} "
          f"split={args.split} band={args.band} "
          f"backend={jax.default_backend()}", flush=True)

    spos, smass, salive, unsort = mesh_ops._hilbert_sort(
        pos, mass, alive, origin, side)
    kernel = mesh_ops.kernel_hats_for(side, jnp.float32(1.0),
                                      mesh_level=args.level,
                                      split_cells=args.split)
    rho_ex = jnp.zeros((grid, grid), jnp.float32)
    jax.block_until_ready((spos, kernel, rho_ex))

    # correctness check of the run-combined deposit vs baseline (CPU-safe)
    base, w = mesh_ops._cic_cells(spos, origin, h, nw, 2)
    r_ref = mesh_ops._deposit_packed(smass, base, w, nw, grid)
    r_new = deposit_run_combined(smass, base, w, nw, grid)
    err = float(jnp.max(jnp.abs(r_ref - r_new)) / jnp.max(jnp.abs(r_ref)))
    print(f"# run-combined deposit max rel err vs baseline: {err:.2e}",
          flush=True)
    f_ref = jnp.fft.irfft2(jnp.fft.rfft2(r_ref) * kernel[2], s=(grid, grid))
    f_new = fft_trimmed(r_ref, kernel[2], nw, grid)
    errf = float(jnp.max(jnp.abs(f_ref - f_new))
                 / jnp.max(jnp.abs(f_ref)))
    print(f"# trimmed fft max rel err vs baseline: {errf:.2e}", flush=True)

    @jax.jit
    def ph_dep_base(s):
        b, ww = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2)
        rho = mesh_ops._deposit_packed(smass, b, ww, nw, grid)
        return rho[0, 0] + jnp.sum(rho[0, :8]) + s

    @jax.jit
    def ph_dep_run(s):
        b, ww = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2)
        rho = deposit_run_combined(smass, b, ww, nw, grid)
        return rho[0, 0] + jnp.sum(rho[0, :8]) + s

    @jax.jit
    def ph_dep_sorted(s):
        b, ww = mesh_ops._cic_cells(spos + s * 1e-6, origin, h, nw, 2)
        rho = deposit_sorted_scatter(smass, b, ww, nw, grid)
        return rho[0, 0] + jnp.sum(rho[0, :8]) + s

    # rho AND the kernel must be ARGUMENTS: a closed-over (grid, grid) or
    # (grid, grid/2+1) complex array gets inlined as a >256 MB mlir
    # constant, which this backend rejects (UNIMPLEMENTED).
    @jax.jit
    def _fft_base(rho, ph, s):
        phi = jnp.fft.irfft2(jnp.fft.rfft2(rho + s * 1e-6) * ph,
                             s=(grid, grid))
        return phi[0, 0] + s

    @jax.jit
    def _fft_trim(rho, ph, s):
        phi = fft_trimmed(rho + s * 1e-6, ph, nw, grid)
        return phi[0, 0] + s

    ph_fft_base = lambda s: _fft_base(rho_ex, kernel[2], s)
    ph_fft_trim = lambda s: _fft_trim(rho_ex, kernel[2], s)

    def band_fn(chunk):
        @jax.jit
        def f(s):
            acc = mesh_ops._band_short_range(
                spos + s * 1e-6, smass, jnp.float32(1.0), a,
                band=args.band, chunk=chunk)
            return acc[0, 0] + s
        return f

    def rescue_fn(chunk, k):
        @jax.jit
        def f(s):
            acc, need = mesh_ops._block_rescue(
                spos + s * 1e-6, smass, salive, jnp.float32(1.0), a,
                band=args.band, k=k, chunk=chunk)
            return acc[0, 0] + need.astype(jnp.float32) * 1e-9 + s
        return f

    chained_time(ph_dep_base, args.iters, "deposit baseline (4-plane)")
    chained_time(ph_dep_run, args.iters, "deposit run-combined")
    chained_time(ph_dep_sorted, args.iters, "deposit base-sorted")
    chained_time(ph_fft_base, args.iters, "fft baseline")
    chained_time(ph_fft_trim, args.iters, "fft trimmed fwd")
    for chunk in (16384, 32768, 65536):
        chained_time(band_fn(chunk), args.iters, f"band chunk={chunk}")
    for chunk in (16384, 32768):
        for k in (8, 12):
            chained_time(rescue_fn(chunk, k), args.iters,
                         f"rescue chunk={chunk} k={k}")


if __name__ == "__main__":
    main()
