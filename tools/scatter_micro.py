"""Micro-benchmark of mass-deposit scatter formulations (round-2 perf).

Variants at N=1M, level-12 world grid (nw=4096, padded FFT grid=8192):
  s1: 4 scalar scatter-adds into (grid*grid,)      [round-1 shipped]
  s2: 4 scalar scatter-adds into (nw*nw,) + pad-shift combine
  s3: 1 row scatter (n,4) into (nw*nw, 4)          [packed, current]
  s4: sorted scalar scatters (argsort base first, indices_are_sorted)
  s5: 4 scalar scatters with 2D (nw, nw) target, 2D indices
Honest timing: chained salts, one host pull.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def chained_time(fn, iters, label):
    s = jnp.float32(1.000001)
    float(fn(s))
    s = fn(s * 1.000001)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:34s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nw", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()
    n, nw = args.n, args.nw
    grid = 2 * nw

    key = jax.random.PRNGKey(0)
    kx, ky, km, ks = jax.random.split(key, 4)
    # random positions in cell units, like a real scene after scaling
    px = jax.random.uniform(kx, (n,), jnp.float32, 0.0, nw - 1.0)
    py = jax.random.uniform(ky, (n,), jnp.float32, 0.0, nw - 1.0)
    mass = jax.random.uniform(km, (n,), jnp.float32, 0.5, 1.5)
    # Hilbert-ish sorted variant: sort by (iy*nw+ix) to mimic locality
    print(f"# n={n} nw={nw} grid={grid} backend={jax.default_backend()}")

    def cic(pxs, pys):
        bx = jnp.floor(pxs - 0.5).astype(jnp.int32)
        by = jnp.floor(pys - 0.5).astype(jnp.int32)
        fx = pxs - 0.5 - bx
        fy = pys - 0.5 - by
        bx = jnp.clip(bx, 0, nw - 1)
        by = jnp.clip(by, 0, nw - 1)
        w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                       (1 - fx) * fy, fx * fy], axis=1)
        return bx, by, w

    @jax.jit
    def s1(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        idx4 = (by * grid + bx, by * grid + bx + 1,
                (by + 1) * grid + bx, (by + 1) * grid + bx + 1)
        rho = jnp.zeros((grid * grid,), jnp.float32)
        for k, idx in enumerate(idx4):
            rho = rho.at[idx].add(mass * w[:, k])
        return rho[0] + s

    @jax.jit
    def s2(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        g = jnp.zeros((4, nw * nw), jnp.float32)
        for k in range(4):
            g = g.at[k, base].add(mass * w[:, k])
        gg = g.reshape(4, nw, nw)
        world = (jnp.pad(gg[0], ((0, 1), (0, 1)))
                 + jnp.pad(gg[1], ((0, 1), (1, 0)))
                 + jnp.pad(gg[2], ((1, 0), (0, 1)))
                 + jnp.pad(gg[3], ((1, 0), (1, 0))))
        return world[0, 0] + s

    @jax.jit
    def s2b(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        planes = []
        for k in range(4):
            planes.append(jnp.zeros((nw * nw,), jnp.float32)
                          .at[base].add(mass * w[:, k]).reshape(nw, nw))
        world = (jnp.pad(planes[0], ((0, 1), (0, 1)))
                 + jnp.pad(planes[1], ((0, 1), (1, 0)))
                 + jnp.pad(planes[2], ((1, 0), (0, 1)))
                 + jnp.pad(planes[3], ((1, 0), (1, 0))))
        return world[0, 0] + s

    @jax.jit
    def s3(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        acc = jnp.zeros((nw * nw, 4), jnp.float32).at[base].add(
            mass[:, None] * w)
        return acc[0, 0] + s

    @jax.jit
    def s4(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        order = jnp.argsort(base)
        sb = base[order]
        sm = mass[order]
        sw = w[order]
        g = jnp.zeros((4, nw * nw), jnp.float32)
        for k in range(4):
            g = g.at[k, sb].add(sm * sw[:, k], indices_are_sorted=True)
        return g[0, 0] + s

    @jax.jit
    def s5(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        rho = jnp.zeros((nw, nw), jnp.float32)
        rho = rho.at[by, bx].add(mass * w[:, 0])
        rho = rho.at[by, bx + 1].add(mass * w[:, 1])
        rho = rho.at[by + 1, bx].add(mass * w[:, 2])
        rho = rho.at[by + 1, bx + 1].add(mass * w[:, 3])
        return rho[0, 0] + s

    @jax.jit
    def s6(s):
        # single fused scatter: 4n scalar updates in one op
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        idx = jnp.concatenate([by * grid + bx, by * grid + bx + 1,
                               (by + 1) * grid + bx,
                               (by + 1) * grid + bx + 1])
        val = jnp.concatenate([mass * w[:, 0], mass * w[:, 1],
                               mass * w[:, 2], mass * w[:, 3]])
        rho = jnp.zeros((grid * grid,), jnp.float32).at[idx].add(val)
        return rho[0] + s

    chained_time(s1, args.iters, "s1 4x scalar -> (grid^2,)")
    chained_time(s2, args.iters, "s2 4x scalar -> (4, nw^2) +shift")
    chained_time(s2b, args.iters, "s2b 4x scalar -> 4x(nw^2,) +shift")
    chained_time(s3, args.iters, "s3 row (n,4) -> (nw^2,4)")
    chained_time(s4, args.iters, "s4 argsort + sorted scalar")
    chained_time(s5, args.iters, "s5 4x scalar 2D (nw,nw)")
    chained_time(s6, args.iters, "s6 1x fused 4n scalar")


if __name__ == "__main__":
    main()
