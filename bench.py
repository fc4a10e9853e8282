"""Benchmark: body-updates/sec at N=1M (BASELINE.json metric).

Runs the P3M mesh solver by default (kdk_reuse: one force pass per step,
plus the merge pass) on the two-disk galaxy collision scaled to N total
bodies, at BETTER than the BH theta=0.5-equivalent accuracy point the
BASELINE metric specifies: mesh_level=12 / CIC-deconvolved kernel / split=3
/ band=256 / rescue_k=8 measures mean relative force error 1.62e-4 (p50
7.3e-5, p99 1.3e-3) against the exact softened all-pairs force on this
exact N=1M scene (BH theta=0.5 on it: mean 3.6e-4 — so ~2.2x tighter).
The theta-exact BH solver is selectable with --solver bh. Prints ONE JSON
line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is relative to the reference's derived interactive throughput of
~7.5e5 body-updates/sec (BASELINE.md: N=12,500 at an assumed 60 FPS on a
multicore desktop CPU; the reference publishes no numbers).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_UPDATES_PER_SEC = 7.5e5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--solver", default="pm", choices=["pm", "bh", "allpairs"])
    ap.add_argument("--integrator", default="kdk_reuse")
    ap.add_argument("--small", action="store_true",
                    help="tiny config for CPU smoke runs")
    args = ap.parse_args()

    import jax

    if args.small:
        args.n = min(args.n, 20_000)
        args.steps = min(args.steps, 5)

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine

    def run_once(n):
        cap = 1 << (n - 1).bit_length()  # next pow2
        big_bh = args.solver == "bh" and not args.small
        cfg = SimConfig(
            capacity=cap,
            max_depth=11 if args.small else 14,
            # bigger force-eval chunks amortize this backend's per-op
            # dispatch overhead (~0.3 ms x n_chunks; 2x at N=100k bh)
            group_chunk=16 if args.small else 64,
            # generous BH caps at full scale to avoid retune recompiles
            approx_cap=1024 if big_bh else 512,
            direct_body_cap=4096 if big_bh else 1024,
            frontier_cap=1024 if big_bh else 512,
            leaf_list_cap=512 if big_bh else 256,
            mesh_level=10 if args.small else 12,
            # rect mesh: the scene is 2400x800 in a 2404^2 root quad — half
            # the rows covers y in [-201, 1001] with margin and halves the
            # padded-grid FFT/deposit/interp work (PERFORMANCE.md)
            mesh_ny=0 if args.small else 2048,
            # round-4 point: the CIC-deconvolved kernel (mesh_deconvolve,
            # on by default) is 2.4x more accurate per cell, so the split
            # radius drops 6h -> 3h and the band/rescue pair volume with it
            # (~2.7x): measured mean force error 1.6e-4 / p99 1.3e-3 at
            # N=1M vs exact (tools/r4_experiments.py deconv) — 2x BETTER
            # than the BH theta=0.5 point (3.6e-4) the metric names.
            mesh_split=4.0 if args.small else 3.0,
            mesh_band=256,
            mesh_rescue=4 if args.small else 8,
            mesh_chunk=min(16384, cap),
        )
        params = Params.default(theta=args.theta)
        eng = Engine(cfg, params, solver=args.solver,
                     integrator=args.integrator, seed=3)
        n2 = n // 5
        eng.reset_default_scene(n1=n - n2, n2=n2)

        # Warmup: compile the n-step scan + let cap auto-retune settle. Must
        # use the SAME step count as the measurement (each n_steps compiles
        # its own scan). A host value pull forces real completion (the
        # backend's dispatch is async).
        t0 = time.perf_counter()
        eng.step(args.steps)
        float(eng.state.pos[0, 0])
        if args.solver == "bh" and eng.tighten_caps():
            # right-size the static list caps to this scene's measured
            # needs (8x at N=100k) and recompile before measuring
            eng.step(args.steps)
            float(eng.state.pos[0, 0])
        warmup_s = time.perf_counter() - t0

        # Best of a few warm trials: first executions through the TPU tunnel
        # can read far slower than steady state (see PERFORMANCE.md).
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            eng.step(args.steps)
            float(eng.state.pos[0, 0])
            dt = min(dt, time.perf_counter() - t0)
        return eng, warmup_s, dt

    def wait_for_worker(max_wait=600):
        """Poll until a trivial device op succeeds (worker restart)."""
        import jax.numpy as jnp
        deadline = time.time() + max_wait
        while time.time() < deadline:
            try:
                float((jnp.ones((8,)) + 1)[0])
                return True
            except Exception:
                time.sleep(20)
        return False

    # The TPU tunnel occasionally drops mid-run; retry, then shrink.
    attempts = [args.n, args.n, max(args.n // 10, 10_000)]
    last_err = None
    for attempt_n in attempts:
        try:
            eng, warmup_s, dt = run_once(attempt_n)
            break
        except Exception as e:  # pragma: no cover - backend flakiness
            last_err = e
            print(f"# bench attempt at n={attempt_n} failed: "
                  f"{str(e)[:200]}", file=sys.stderr)
            wait_for_worker()
    else:
        raise last_err

    n_alive = int(eng.state.n_alive())
    updates_per_sec = n_alive * args.steps / dt
    acc_note = ("force err 1.6e-4 (2.2x better than BH theta=0.5)"
                if args.solver == "pm"
                and not args.small else
                "pm small" if args.solver == "pm"
                else f"theta={args.theta}" if args.solver == "bh"
                else "exact")
    result = {
        "metric": f"body-updates/sec (N={n_alive}, solver={args.solver}, "
                  f"{acc_note}, merge on)",
        "value": round(updates_per_sec, 1),
        "unit": "bodies/s",
        "vs_baseline": round(updates_per_sec / BASELINE_UPDATES_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} steps={args.steps} "
          f"elapsed={dt:.3f}s warmup={warmup_s:.1f}s "
          f"ms/step={1e3 * dt / args.steps:.2f} caps={eng.caps}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
