"""Microbench: BH force-phase internals at real bench shapes.

tools/pairblock_micro.py showed the dense pair math alone runs ~13 ms for
the N=100k pair volume, while the real force phase costs ~158 ms — the gap
must be the per-group input plumbing. This times each piece in isolation:

  gatherA   node_rows[(G, A)] row gather from (NC, 10)
  gatherD   body_rows[(G, DB)] row gather from (cap, 4)
  slices    per-group dynamic_slice of bpos
  full      the real one_group body (gathers + masks + pair math)

    python tools/bh_force_micro.py
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def chained_time(fn, iters, label):
    s = jnp.float32(1.000001)
    float(fn(s))
    float(fn(s * 1.000001))
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:10s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=704)
    ap.add_argument("--gs", type=int, default=512)
    ap.add_argument("--a", type=int, default=768)
    ap.add_argument("--db", type=int, default=1920)
    ap.add_argument("--nc", type=int, default=27136)
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    G, GS, A, DB = args.groups, args.gs, args.a, args.db
    NC, cap, C = args.nc, args.cap, args.chunk

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    node_rows = jax.random.uniform(ks[0], (NC, 10), jnp.float32)
    body_rows = jax.random.uniform(ks[1], (cap, 4), jnp.float32)
    spos = jax.random.uniform(ks[2], (cap, 2), jnp.float32, 0.0, 2400.0)
    aidx = jax.random.randint(ks[3], (G, A), 0, NC, jnp.int32)
    psl = jax.random.randint(ks[4], (G, DB), 0, cap, jnp.int32)
    gstart = jnp.sort(jax.random.randint(ks[5], (G,), 0, cap - GS, jnp.int32))
    a_len = jax.random.randint(ks[6], (G,), 0, A, jnp.int32)
    pvalid = jax.random.uniform(ks[7], (G, DB)) < 0.7
    soft2 = jnp.float32(0.6)

    def chunked(f, *xs):
        xs = jax.tree.map(
            lambda x: x.reshape((G // C, C) + x.shape[1:]), xs)
        return jax.lax.map(lambda a: jax.vmap(f)(*a), xs)

    def t_gatherA(s):
        out = chunked(lambda ai: node_rows[ai], aidx + (s > 0).astype(jnp.int32) - 1)
        return out.reshape(-1)[0] + s

    def t_gatherD(s):
        out = chunked(lambda pi: body_rows[pi], psl + (s > 0).astype(jnp.int32) - 1)
        return out.reshape(-1)[0] + s

    def t_slices(s):
        out = chunked(
            lambda gs_: jax.lax.dynamic_slice_in_dim(
                spos, jnp.clip(gs_, 0, cap - GS), GS, 0), gstart)
        return out.reshape(-1)[0] + s

    def point_accel(bpos, src_pos, src_mass):
        dx = src_pos[None, :, 0] - bpos[:, None, 0]
        dy = src_pos[None, :, 1] - bpos[:, None, 1]
        r2 = dx * dx + dy * dy + soft2
        w = src_mass[None, :] * jax.lax.rsqrt(r2) / r2
        return jnp.stack([jnp.sum(w * dx, axis=1),
                          jnp.sum(w * dy, axis=1)], -1)

    def one_group(gs_, apx, al, pi, pv):
        sl0 = jnp.clip(gs_, 0, cap - GS)
        bpos = jax.lax.dynamic_slice_in_dim(spos, sl0, GS, 0)
        avalid = jnp.arange(A, dtype=jnp.int32) < al
        arows = node_rows[jnp.where(avalid, apx, 0)]
        acc = point_accel(bpos, arows[:, 1:3],
                          jnp.where(avalid, arows[:, 0], 0.0))
        prow = body_rows[pi]
        acc = acc + point_accel(bpos, prow[:, 0:2],
                                jnp.where(pv, prow[:, 2], 0.0))
        return acc

    def t_full(s):
        salt = (s > 0).astype(jnp.int32) - 1
        out = chunked(one_group, gstart, aidx + salt, a_len, psl + salt,
                      pvalid)
        return out.reshape(-1)[0] + s

    for name, f in (("gatherA", t_gatherA), ("gatherD", t_gatherD),
                    ("slices", t_slices), ("full", t_full)):
        chained_time(jax.jit(f), args.iters, name)


if __name__ == "__main__":
    main()
