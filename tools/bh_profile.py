"""BH solver step-cost profile: build / classify / force phases + end-to-end.

Measures the dense (monotone-MAC classification) vs bfs traversal cost and
the end-to-end Engine step at a given N, with honest chained timing
(PERFORMANCE.md: salted inputs, one host pull).

    python tools/bh_profile.py --n 100000 [--traversal dense|bfs] [--e2e]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def chained_time(fn, iters, label):
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--traversal", default="dense")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--e2e", action="store_true",
                    help="also run the Engine end-to-end step timing")
    ap.add_argument("--phases", action="store_true",
                    help="time make_groups / classify / force separately")
    args = ap.parse_args()

    import dataclasses

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Caps, Engine, make_bh_accel
    from tpu_nbody.models import scenes
    from tpu_nbody.ops import tree as tree_lib, traverse

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap, max_depth=14, group_chunk=64,
                    bh_traversal=args.traversal)
    params = Params.default(theta=args.theta)

    # representative scene + measured-need caps via a warm Engine step
    eng = Engine(cfg, params, solver="bh", integrator="kdk_reuse", seed=3)
    n2 = args.n // 5
    eng.reset_default_scene(n1=args.n - n2, n2=n2)
    eng.step(1)
    eng.tighten_caps()
    eng.step(1)
    caps = eng.caps
    print(f"# n={args.n} traversal={args.traversal} caps={caps}", flush=True)

    st = eng.state
    pos, mass, alive = st.pos, st.mass, st.alive
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half

    @jax.jit
    def ph_build(s):
        t = tree_lib.build_tree(pos + s * 1e-7, mass, alive, origin, side,
                                num_nodes=caps.num_nodes,
                                leaf_size=cfg.leaf_size,
                                max_depth=cfg.max_depth)
        return t.node_rows[0, 0] + s

    accel = make_bh_accel(cfg, caps)

    @jax.jit
    def ph_full(s):
        acc, _ = accel(pos + s * 1e-7, mass, alive, params)
        return acc[0, 0] + s

    t_build = chained_time(ph_build, args.iters, "tree build")

    if args.phases:
        # Per-phase probes on a FIXED tree (memoization beaten by salting
        # the phase's own scalar inputs: theta for classification, soft2
        # for the force math — gather patterns unchanged, which is what we
        # are timing).
        t = tree_lib.build_tree(pos, mass, alive, origin, side,
                                num_nodes=caps.num_nodes,
                                leaf_size=cfg.leaf_size,
                                max_depth=cfg.max_depth)
        t = jax.block_until_ready(t)
        GS = caps.group_size

        def staged(stage):
            # cumulative stage probes on the FIXED tree, salted via theta
            def fn(s):
                out, _ = traverse.bh_accel_from_tree(
                    t, args.theta + s * 1e-9, float(params.soft2),
                    float(params.G), group_size=GS,
                    group_cap=caps.group_cap, max_depth=cfg.max_depth,
                    frontier_cap=caps.frontier_cap,
                    approx_cap=caps.approx_cap,
                    leaf_list_cap=caps.leaf_list_cap,
                    direct_body_cap=caps.direct_body_cap,
                    group_chunk=cfg.group_chunk, traversal=args.traversal,
                    debug_stage=stage)
                return jnp.ravel(out)[0].astype(jnp.float32) + s
            return jax.jit(fn)

        for stage in ("aabb", "classify", "force", "full"):
            chained_time(staged(stage), args.iters, f"cum:{stage}")

    t_full = chained_time(ph_full, args.iters, "build + traverse + force")
    print(f"# force pass (full - build overlap bound): {t_full:.1f} ms; "
          f"updates/s at 1 pass/step: {args.n / t_full * 1e3:,.0f}",
          flush=True)

    if args.e2e:
        t0 = time.perf_counter()
        eng.step(args.steps)
        float(eng.state.pos[0, 0])
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.step(args.steps)
            float(eng.state.pos[0, 0])
            best = min(best, time.perf_counter() - t0)
        n_alive = int(eng.state.n_alive())
        print(f"# e2e kdk_reuse+merge: {best / args.steps * 1e3:.1f} ms/step "
              f"(warmup {warm:.1f}s), {n_alive * args.steps / best:,.0f} "
              f"updates/s", flush=True)


if __name__ == "__main__":
    main()
