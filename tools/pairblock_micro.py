"""Microbench: formulations of the BH blocked pair kernel (GS x P).

The BH force phase evaluates (group_size x partner) pair blocks; at the
N=100k bench shape that is ~1e9 pairs/pass and measured ~200 ms with the
broadcast VPU form (tools/bh_profile.py) — ~5 Gpairs/s, vs ~29 Gpairs/s for
the all-pairs einsum. Candidates, timed honestly (salted inputs, one host
pull):

  * bcast:   dx/dy broadcasts + w*d reductions (current _point_accel)
  * einsum:  same dx/dy but the output contraction as einsum gp,gpd->gd
  * mxu:     r2 via |b|^2+|s|^2-2<b,s> (cross term on the MXU) and the
             output as w @ [sx, sy, 1] — needs recentered coordinates to
             bound the cancellation (see traverse._point_accel docstring)

    python tools/pairblock_micro.py --groups 704 --gs 512 --p 2688
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
    ap.add_argument("--p", type=int, default=2688)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    G, GS, P = args.groups, args.gs, args.p

    key = jax.random.PRNGKey(0)
    kb, kp, km = jax.random.split(key, 3)
    bpos = jax.random.uniform(kb, (G, GS, 2), jnp.float32, 0.0, 2400.0)
    spos = jax.random.uniform(kp, (G, P, 2), jnp.float32, 0.0, 2400.0)
    smass = jax.random.uniform(km, (G, P), jnp.float32, 0.0, 2.0)
    soft2 = jnp.float32(0.6)

    def bcast(b, sp, sm):
        dx = sp[None, :, 0] - b[:, None, 0]
        dy = sp[None, :, 1] - b[:, None, 1]
        r2 = dx * dx + dy * dy + soft2
        w = sm[None, :] * jax.lax.rsqrt(r2) / r2
        return jnp.stack([jnp.sum(w * dx, axis=1),
                          jnp.sum(w * dy, axis=1)], -1)

    def einsum_out(b, sp, sm):
        d = sp[None, :, :] - b[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + soft2
        w = sm[None, :] * jax.lax.rsqrt(r2) / r2
        return jnp.einsum("gp,gpd->gd", w, d)

    def mxu(b, sp, sm):
        c = 0.5 * (jnp.min(b, axis=0) + jnp.max(b, axis=0))
        bc = b - c
        sc = sp - c
        b2 = jnp.sum(bc * bc, axis=1, keepdims=True)
        s2 = jnp.sum(sc * sc, axis=1)[None, :]
        r2 = jnp.maximum(b2 + s2 - 2.0 * (bc @ sc.T), 0.0) + soft2
        w = sm[None, :] * jax.lax.rsqrt(r2) / r2            # (GS, P)
        S = jnp.concatenate([sc, jnp.ones((sc.shape[0], 1), sc.dtype)], 1)
        out = w @ S                                          # (GS, 3)
        return out[:, :2] - bc * out[:, 2:3]

    for name, f in (("bcast", bcast), ("einsum", einsum_out), ("mxu", mxu)):
        def run(s, f=f):
            out = jax.lax.map(
                lambda a: jax.vmap(f)(*a),
                jax.tree.map(lambda x: x.reshape(
                    (G // args.chunk, args.chunk) + x.shape[1:]),
                    (bpos + s, spos, smass)))
            return out.reshape(-1)[0] + s
        chained_time(jax.jit(run), args.iters, name)
    print(f"# pairs/pass = {G * GS * P / 1e9:.2f} G")


if __name__ == "__main__":
    main()
