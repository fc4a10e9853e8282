"""Micro-benchmark of force-interp gather formulations + deposit splits.

  g1: packed (nw^2, 8) row gather                 [current, ~30 ms]
  g2: 8 independent scalar gathers from 8 (nw^2,) planes
  g3: 4 independent (nw^2, 2) row gathers
  d8: deposit s2b with bodies split 2-ways (8 independent scatters)
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
    kx, ky, km = jax.random.split(key, 3)
    px = jax.random.uniform(kx, (n,), jnp.float32, 0.0, nw - 1.0)
    py = jax.random.uniform(ky, (n,), jnp.float32, 0.0, nw - 1.0)
    mass = jax.random.uniform(km, (n,), jnp.float32, 0.5, 1.5)
    fxg = jax.random.uniform(kx, (grid, grid), jnp.float32)
    fyg = jax.random.uniform(ky, (grid, grid), jnp.float32)
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

    sl = lambda gz, dy, dx: jax.lax.dynamic_slice(gz, (dy, dx), (nw, nw))

    @jax.jit
    def g1(fxg, fyg, s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        F = jnp.stack([sl(fxg, 0, 0), sl(fyg, 0, 0), sl(fxg, 0, 1),
                       sl(fyg, 0, 1), sl(fxg, 1, 0), sl(fyg, 1, 0),
                       sl(fxg, 1, 1), sl(fyg, 1, 1)], axis=-1)
        rows = F.reshape(nw * nw, 8)[base]
        ax = (w[:, 0] * rows[:, 0] + w[:, 1] * rows[:, 2]
              + w[:, 2] * rows[:, 4] + w[:, 3] * rows[:, 6])
        ay = (w[:, 0] * rows[:, 1] + w[:, 1] * rows[:, 3]
              + w[:, 2] * rows[:, 5] + w[:, 3] * rows[:, 7])
        return ax[0] + ay[0] + s

    @jax.jit
    def g2(fxg, fyg, s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        ax = jnp.zeros((n,), jnp.float32)
        ay = jnp.zeros((n,), jnp.float32)
        for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            ax = ax + sl(fxg, dy, dx).reshape(-1)[base] * w[:, k]
            ay = ay + sl(fyg, dy, dx).reshape(-1)[base] * w[:, k]
        return ax[0] + ay[0] + s

    @jax.jit
    def g3(fxg, fyg, s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        ax = jnp.zeros((n,), jnp.float32)
        ay = jnp.zeros((n,), jnp.float32)
        for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            F = jnp.stack([sl(fxg, dy, dx), sl(fyg, dy, dx)], axis=-1)
            rows = F.reshape(nw * nw, 2)[base]
            ax = ax + rows[:, 0] * w[:, k]
            ay = ay + rows[:, 1] * w[:, k]
        return ax[0] + ay[0] + s

    @jax.jit
    def d8(s):
        pxs = px + s * 1e-6
        bx, by, w = cic(pxs, py)
        base = by * nw + bx
        h = n // 2
        planes = []
        for k in range(4):
            pa = (jnp.zeros((nw * nw,), jnp.float32)
                  .at[base[:h]].add(mass[:h] * w[:h, k]))
            pb = (jnp.zeros((nw * nw,), jnp.float32)
                  .at[base[h:]].add(mass[h:] * w[h:, k]))
            planes.append((pa + pb).reshape(nw, nw))
        world = (jnp.pad(planes[0], ((0, 1), (0, 1)))
                 + jnp.pad(planes[1], ((0, 1), (1, 0)))
                 + jnp.pad(planes[2], ((1, 0), (0, 1)))
                 + jnp.pad(planes[3], ((1, 0), (1, 0))))
        return world[0, 0] + s

    chained_time(lambda s: g1(fxg, fyg, s), args.iters, "g1 packed (nw^2,8) row gather")
    chained_time(lambda s: g2(fxg, fyg, s), args.iters, "g2 8x scalar plane gathers")
    chained_time(lambda s: g3(fxg, fyg, s), args.iters, "g3 4x (nw^2,2) row gathers")
    chained_time(d8, args.iters, "d8 deposit 8 indep scatters")


if __name__ == "__main__":
    main()
