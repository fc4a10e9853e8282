"""Sampled-exact P3M accuracy at large N (10M-scale), on the TPU.

Full all-pairs reference is O(N^2) — at N=10M that is 1e14 pairs (hours).
Instead measure the relative force error on a RANDOM SAMPLE of targets
against the exact softened force from ALL alive sources: s x N pairs
(2000 x 10M = 2e10 ≈ a second at this backend's dense pair rate), which
estimates the same error distribution the full sweeps measure at 1M
(tools/accuracy_sweep.py) to sampling noise ~1/sqrt(s).

Usage:
    python tools/acc_sampled.py --n 10000000 --samples 2000 \
        --level 12 --ny 2048 --split 2.5 --band 128 --rescue 8
"""

from __future__ import annotations

import argparse
import time


def exact_sampled(tpos, pos, mass, G, soft2, chunk=1 << 20):
    """Exact softened accel at target rows `tpos` from all sources."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(tp, p, m):
        def body(carry, srcs):
            sp, sm = srcs
            d = sp[None, :, :] - tp[:, None, :]            # (s, c, 2)
            r2 = jnp.sum(d * d, axis=-1) + soft2
            inv = jax.lax.rsqrt(r2)
            f = (G * sm[None, :]) * inv * inv * inv
            return carry + jnp.sum(f[:, :, None] * d, axis=1), None

        nc = p.shape[0] // chunk
        acc0 = jnp.zeros_like(tp)
        acc, _ = jax.lax.scan(
            body, acc0, (p.reshape(nc, chunk, 2), m.reshape(nc, chunk)))
        return acc

    return go(tpos, pos, mass)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--samples", type=int, default=2000)
    ap.add_argument("--level", type=int, default=12)
    ap.add_argument("--ny", type=int, default=2048)
    ap.add_argument("--split", type=float, default=2.5)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--rescue", type=int, default=8)
    ap.add_argument("--order", type=int, default=2)
    ap.add_argument("--interlace", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from tpu_nbody.config import SimConfig
    from tpu_nbody.models import scenes
    from tpu_nbody.ops import mesh as mesh_ops

    n = args.n
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(capacity=cap)
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    n2 = n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(args.seed),
                                            n1=n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[:n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[:n].set(m)
    alive = jnp.arange(cap) < n
    G, soft2 = 80.0, 1.0

    # sample alive targets (dead rows have mass 0 and pos 0 — skip them)
    rng = np.random.default_rng(args.seed)
    sel = rng.choice(n, size=args.samples, replace=False)
    sel = jnp.asarray(np.sort(sel))
    tpos = pos[sel]

    t0 = time.perf_counter()
    ref = np.asarray(exact_sampled(tpos, pos, mass, G, soft2))
    print(f"# exact sampled reference: {args.samples} targets x {cap} "
          f"sources in {time.perf_counter() - t0:.1f}s", flush=True)
    refn = np.linalg.norm(ref, axis=-1)

    t0 = time.perf_counter()
    acc = np.asarray(mesh_ops.pm_accel(
        pos, mass, alive, G, jnp.float32(soft2), origin, side,
        mesh_level=args.level, split_cells=args.split, band=args.band,
        chunk=16384, rescue_k=args.rescue, mesh_ny=args.ny,
        order=args.order, interlace=args.interlace))[np.asarray(sel)]
    print(f"# pm_accel full pass in {time.perf_counter() - t0:.1f}s "
          f"(first call: includes compile)", flush=True)

    rel = np.linalg.norm(acc - ref, axis=-1) / (refn + 1e-9)
    print(f"# n={n} lvl={args.level} ny={args.ny} split={args.split} "
          f"band={args.band} k={args.rescue} order={args.order} "
          f"interlace={args.interlace}")
    print(f"mean {rel.mean():.2e}  p50 {np.median(rel):.2e}  "
          f"p99 {np.percentile(rel, 99):.2e}  max {rel.max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
