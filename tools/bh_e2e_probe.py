"""Bisect the BH N=1M end-to-end fault: scan length vs worker crash.

Round 4's bench run at ``--solver bh`` died with "TPU worker process
crashed or restarted" during the 20-step kdk_reuse scan at N=1M, even
though every executable holds exactly ONE traversal instance (the
twin-traversal mitigation, PERFORMANCE.md). This probe builds the exact
bench engine and steps it with increasing scan lengths to locate the
fault, timing whatever survives.

    python tools/bh_e2e_probe.py --n 1000000 --lengths 1 2 5 20

``--mode stream`` (the default, round 5) steps via ``Engine.step_stream``
— n single-step executables, no scan — which is how ``bench.py --solver
bh`` runs at scale; ``--mode scan`` reproduces the original fault.
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--lengths", type=int, nargs="+", default=[1, 2, 5, 20])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--mode", default="stream", choices=["stream", "scan"])
    args = ap.parse_args()

    import jax

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine

    n = args.n
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(
        capacity=cap, max_depth=14, group_chunk=64,
        approx_cap=1024, direct_body_cap=16384, frontier_cap=1024,
        leaf_list_cap=2048, bh_hier_cand_caps=(131072, 32768, 4096))
    params = Params.default(theta=args.theta)
    eng = Engine(cfg, params, solver="bh", integrator="kdk_reuse", seed=3)
    n2 = n // 5
    eng.reset_default_scene(n1=n - n2, n2=n2)

    advance = eng.step_stream if args.mode == "stream" else eng.step

    for L in args.lengths:
        t0 = time.perf_counter()
        try:
            advance(L)
            float(eng.state.pos[0, 0])
        except Exception as e:
            print(f"len={L:3d}  FAULT after {time.perf_counter()-t0:.0f}s: "
                  f"{str(e)[:160]}", flush=True)
            return
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            advance(L)
            float(eng.state.pos[0, 0])
            best = min(best, time.perf_counter() - t0)
        print(f"len={L:3d}  ok  warmup {warm:6.1f}s  best "
              f"{best*1e3:8.1f} ms = {best*1e3/L:7.1f} ms/step "
              f"({int(eng.state.n_alive())*L/best/1e6:.2f}M updates/s)",
              flush=True)


if __name__ == "__main__":
    main()
