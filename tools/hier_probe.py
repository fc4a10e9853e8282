"""Standalone hier-traversal probe: one build + one traversal, no Engine.

Bisects the N=1M hier path without Engine retune recompiles (each retune
is a multi-minute remote compile; worse, a faulting executable wedges the
tunnel worker for ~10 min — see PERFORMANCE.md's twin-traversal note).
Caps are passed explicitly; needs are printed so the right caps for the
bench run can be read off a single execution.

    python tools/hier_probe.py --n 300000 [--stage classify|force|full]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--stage", default="full",
                    choices=["aabb", "classify", "force", "full"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--group-size", type=int, default=512)
    ap.add_argument("--leaf-cap", type=int, default=2048)
    ap.add_argument("--direct-cap", type=int, default=16384)
    ap.add_argument("--cand-caps", type=int, nargs="+",
                    default=[65536, 16384, 4096])
    ap.add_argument("--hier-sizes", type=int, nargs="+",
                    default=[1024, 64, 8])
    ap.add_argument("--hier-batch", type=int, default=32)
    ap.add_argument("--max-depth", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scene", default="twodisk",
                    choices=["twodisk", "uniform", "multi"],
                    help="twodisk = bench scene; uniform = homogeneous "
                         "cloud; multi = 4-galaxy merger (clustered) — "
                         "VERDICT r4 item 10: hier cap needs beyond the "
                         "single tuned scene")
    ap.add_argument("--config", action="append", default=[],
                    help="extra sweep config 'sizes/cand_caps/leaf/direct"
                         "/batch', e.g. '1024,64,8,1/131072,32768,4096,1024"
                         "/1024/4096/8'; repeatable — each reuses the "
                         "already-built tree (one tree compile per process)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_nbody.config import SimConfig
    from tpu_nbody.models import scenes
    from tpu_nbody.ops import traverse, tree as tree_lib

    n = args.n
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(capacity=cap, max_depth=args.max_depth)
    n2 = n // 5
    if args.scene == "uniform":
        p, v, m = scenes.make_uniform_cloud(jax.random.PRNGKey(3), n)
    elif args.scene == "multi":
        p, v, m = scenes.multi_galaxy_merger(jax.random.PRNGKey(3),
                                             n_total=n)
    else:
        p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                                n1=n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[:n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[:n].set(m)
    alive = jnp.arange(cap) < n
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    num_nodes = min(2 * cap, 1 << 20)

    t0 = time.perf_counter()
    t = tree_lib.build_tree(pos, mass, alive, origin, side,
                            num_nodes=num_nodes, leaf_size=cfg.leaf_size,
                            max_depth=args.max_depth)
    t = jax.block_until_ready(t)
    print(f"# tree built in {time.perf_counter() - t0:.1f}s "
          f"(n_nodes={int(t.n_nodes)}, need={int(t.node_need)})",
          flush=True)

    G = max(1, cap // args.group_size)

    configs = [(tuple(args.hier_sizes), tuple(args.cand_caps),
                args.leaf_cap, args.direct_cap, args.hier_batch)]
    for spec in args.config:
        sz, cc, lc, db, hb = spec.split("/")
        configs.append((tuple(int(x) for x in sz.split(",")),
                        tuple(int(x) for x in cc.split(",")),
                        int(lc), int(db), int(hb)))

    stage = args.stage
    for sizes, ccaps, leaf_cap, direct_cap, hb in configs:
        kw = dict(group_size=args.group_size, group_cap=G + 1,
                  max_depth=args.max_depth, frontier_cap=64,
                  approx_cap=64, leaf_list_cap=leaf_cap,
                  direct_body_cap=direct_cap, group_chunk=64,
                  traversal="hier", hier_sizes=sizes,
                  cand_caps=ccaps, hier_batch=hb)
        tag = f"sizes={sizes} caps={ccaps} leaf={leaf_cap} " \
              f"direct={direct_cap} hb={hb}"

        def run(salt):
            # every debug stage returns (array, stats-or-None)
            return traverse.bh_accel_from_tree(
                t, jnp.float32(args.theta + salt * 1e-9), jnp.float32(1.0),
                jnp.float32(80.0), debug_stage=stage, **kw)

        t0 = time.perf_counter()
        out, stats = run(0)
        v0 = float(jnp.ravel(out)[0])
        print(f"# [{tag}] {stage}: first call "
              f"{time.perf_counter() - t0:.1f}s probe={v0:.3e}", flush=True)
        if stats is not None:
            print(f"#   needs: leaf={int(stats.leaf_need)} "
                  f"direct={int(stats.direct_need)} "
                  f"cand={[int(x) for x in stats.cand_need]} "
                  f"group_size_need={int(stats.group_size_need)}",
                  flush=True)

        t0 = time.perf_counter()
        for i in range(1, args.iters + 1):
            out, _ = run(i)
        float(jnp.ravel(out)[0])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"#   {stage}: {dt:.1f} ms/call ({n / dt * 1e3:,.0f} "
              f"updates/s at 1 pass/step)", flush=True)


if __name__ == "__main__":
    main()
