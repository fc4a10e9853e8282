"""Benchmark: body-updates/sec at N=1M (BASELINE.json metric).

Runs the P3M mesh solver by default (kdk_reuse: one force pass per step,
plus the merge pass) on the two-disk galaxy collision scaled to N total
bodies, at BETTER than the BH theta=0.5-equivalent accuracy point the
BASELINE metric specifies: mesh_level=12 / CIC-deconvolved kernel /
split=2.5 / band=128 / rescue_k=8 measures mean relative force error
1.88e-4 (p50 1.0e-4, p99 1.4e-3) against the exact softened all-pairs
force on this exact N=1M scene (BH theta=0.5 on it: mean 3.6e-4 — ~1.9x
tighter).
The theta-exact BH solver is selectable with --solver bh. Prints ONE JSON
line plus a per-phase roofline table on stderr (phase ms vs the measured
backend primitive ceilings + an MFU line — see print_roofline):

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

# Measured backend primitive ceilings (PERFORMANCE.md, TPU v5e via axon):
SCATTER_ITEMS_PER_S = 85e6       # random scatter-add floor
GATHER_ROWS_PER_S = 4.1e7        # packed (n,8) row gather + weight from the
                                 # BENCH-SIZE (ny*nw, 8) = 268 MB table:
                                 # 24.5 ms at 1M rows (tools/r6_experiments
                                 # interp, round 5). The former 1e8 rows/s
                                 # figure came from a small resident table
                                 # and understated the HBM random-row cost
                                 # at this footprint — it made interp look
                                 # 44% SoL when it is in fact ~93%.
PAIR_RATE = 89e9                 # dense pair blocks (band/rescue passes)
ARGSORT_1M_MS = 6.0              # 1M int32 argsort
FFT_4096SQ_MS = 13.0             # rfft2 + irfft2 at 4096^2 f32
MATMUL_PEAK_FLOPS = 25e12        # bf16/f32 matmul speed-of-light


def print_roofline(eng, args, step_ms):
    """Per-phase ms vs the measured primitive ceilings + an MFU line.

    Every phase probe uses the chained-salt discipline this backend
    requires (vary an input per call, pull one host value at the end —
    PERFORMANCE.md); ceilings come from the primitive table so each round's
    claims are checkable against the backend's own speed of light.
    """
    import jax
    import jax.numpy as jnp

    from tpu_nbody.ops import mesh as mesh_ops

    cfg = eng.cfg
    cap = cfg.capacity
    nw = 1 << cfg.mesh_level
    ny = cfg.mesh_ny or nw
    grid, grid_y = 2 * nw, 2 * ny
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    h = side / nw
    a = cfg.mesh_split * float(h)
    S, k = cfg.mesh_band, cfg.mesh_rescue
    K = max(1, cfg.pm_resort_every)
    st = eng.state
    spos, smass, salive, _ = jax.jit(mesh_ops._hilbert_sort)(
        st.pos, st.mass, st.alive, origin, side)
    kernel = mesh_ops.kernel_hats_for(
        side, jnp.float32(eng.params.soft2), mesh_level=cfg.mesh_level,
        split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
        order=cfg.mesh_order, deconvolve=cfg.mesh_deconvolve)
    jax.block_until_ready((spos, kernel))
    n = int(st.n_alive())

    def chained(fn, iters=5):
        s = jnp.float32(1.000001)
        s = fn(s)
        float(s)
        s = fn(s * 1.000001)
        float(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s * 1.000001)
        float(s)
        return (time.perf_counter() - t0) / iters * 1e3

    # NOTE the big arrays are jit ARGUMENTS in every probe (see the FFT
    # note below — closure constants of this size are UNIMPLEMENTED on the
    # tunnel compiler and killed the whole table in early round-4 runs).
    @jax.jit
    def _sort(p, m2, al, s):
        sp, sm, sa, us = mesh_ops._hilbert_sort(p + s * 1e-6, m2, al,
                                                origin, side)
        return sp[0, 0] + us[0] + s

    def ph_sort(s):
        return _sort(st.pos, st.mass, st.alive, s)

    @jax.jit
    def _deposit(sp, sm, s):
        base, w = mesh_ops._cic_cells(sp + s * 1e-6, origin, h, nw,
                                      cfg.mesh_order, ny=ny)
        rho = mesh_ops._deposit_packed(sm, base, w, nw, grid, ny=ny,
                                       grid_y=grid_y)
        return rho[0, 0] + jnp.sum(rho[0, :8]) + s

    def ph_deposit(s):
        return _deposit(spos, smass, s)

    # NOTE all big arrays are passed as ARGUMENTS, not jit-closure
    # constants: embedding a 100MB+ (complex) constant in the executable is
    # UNIMPLEMENTED on this backend's tunnel compiler (probe-bisected; the
    # same graphs run fine with the arrays as runtime args, which is also
    # what production does).
    rho_ex = jnp.zeros((grid_y, grid), jnp.float32)

    @jax.jit
    def _fft(rho0, ph, s):
        pw = mesh_ops._conv_potential(rho0 + s * 1e-6, ph, ny, grid, grid_y)
        return jnp.real(pw[0, 0]) + s

    def ph_fft(s):
        return _fft(rho_ex, kernel[2], s)

    fwin = (jnp.arange((ny + 1) * (nw + 1), dtype=jnp.float32)
            .reshape(ny + 1, nw + 1) * 1e-9)

    @jax.jit
    def _interp(sp, fx0, s):
        base, w = mesh_ops._cic_cells(sp + s * 1e-6, origin, h, nw,
                                      cfg.mesh_order, ny=ny)
        acc = mesh_ops._interp_packed(fx0 + s * 1e-6, fx0, base, w, nw,
                                      ny=ny)
        return acc[0, 0] + s

    def ph_interp(s):
        return _interp(spos, fwin, s)

    @jax.jit
    def _band(sp, sm, s):
        acc = mesh_ops._band_short_range(sp + s * 1e-6, sm,
                                         jnp.float32(1.0), a, band=S,
                                         chunk=min(cfg.mesh_chunk, cap))
        return acc[0, 0] + s

    def ph_band(s):
        return _band(spos, smass, s)

    @jax.jit
    def _rescue(sp, sm, sa, s):
        acc2, need, hot = mesh_ops._block_rescue(
            sp + s * 1e-6, sm, sa, jnp.float32(1.0), a, band=S,
            k=k, chunk=min(cfg.mesh_chunk, cap))
        return acc2[0, 0] + need.astype(jnp.float32) * 1e-9 + s

    def ph_rescue(s):
        return _rescue(spos, smass, salive, s)

    items = cap * (4 if cfg.mesh_order == 2 else 1)
    band_pairs = cap * 3 * S
    rescue_pairs = cap * k * S
    rows = [
        ("hilbert sort (/%d steps)" % K, ph_sort, 1.0 / K,
         ARGSORT_1M_MS * cap / (1 << 20) / K, "argsort 1M = 6 ms"),
        ("deposit (%dx plane scatter)" % (4 if cfg.mesh_order == 2 else 1),
         ph_deposit, 1.0, items / SCATTER_ITEMS_PER_S * 1e3,
         "scatter 85M items/s"),
        ("fft conv (trimmed)", ph_fft, 1.0,
         FFT_4096SQ_MS * (grid_y * grid) / 4096 ** 2,
         "rfft2+irfft2 4096^2 = 13 ms, x elems"),
        ("force interp (8-lane rows)", ph_interp, 1.0,
         cap / GATHER_ROWS_PER_S * 1e3, "row gather 1e8 rows/s"),
        ("band short-range", ph_band, 1.0,
         band_pairs / PAIR_RATE * 1e3, "89 Gpairs/s"),
        ("block rescue k=%d" % k, ph_rescue, 1.0,
         rescue_pairs / PAIR_RATE * 1e3, "89 Gpairs/s"),
    ]
    print("# per-phase roofline (force-pass probes at the bench config; "
          "ceilings = measured backend primitives, PERFORMANCE.md):",
          file=sys.stderr, flush=True)
    tot = 0.0
    for name, fn, scale, ceil, basis in rows:
        try:
            ms = chained(fn) * scale
        except Exception as e:  # pragma: no cover - tunnel flakiness
            print(f"#   {name:30s} probe failed: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            continue
        tot += ms
        pct = 100.0 * ceil / ms if ms > 0 else 0.0
        print(f"#   {name:30s} {ms:7.2f} ms   ceiling {ceil:7.2f} ms "
              f"({pct:3.0f}% SoL; {basis})", file=sys.stderr, flush=True)
    print(f"#   {'sum of probes':30s} {tot:7.2f} ms   (step total "
          f"{step_ms:.2f} ms; rest = integrate+merge+dispatch)",
          file=sys.stderr)
    # MFU: useful arithmetic of one step vs the matmul speed of light.
    pair_flops = 12.0 * (band_pairs + rescue_pairs)
    m_elems = grid_y * grid
    import math
    fft_flops = 2 * 5.0 * m_elems * math.log2(m_elems)  # fwd+inv, trimmed<
    assign_flops = 30.0 * n
    useful = pair_flops + fft_flops + assign_flops
    achieved = useful / (step_ms * 1e-3)
    print(f"#   MFU: ~{useful:.2e} useful flop/step -> "
          f"{achieved / 1e12:.3f} Tflop/s = "
          f"{100.0 * achieved / MATMUL_PEAK_FLOPS:.2f}% of the backend's "
          f"25 Tflop/s matmul peak (step is scatter/FFT-bound by design)",
          file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--solver", default="pm", choices=["pm", "bh", "allpairs"])
    ap.add_argument("--integrator", default="kdk_reuse")
    ap.add_argument("--small", action="store_true",
                    help="tiny config for CPU smoke runs")
    ap.add_argument("--no-phases", action="store_true",
                    help="skip the per-phase roofline table (stderr)")
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
            # measured-need BH caps at full scale to avoid retune
            # recompiles (N=1M hier probe needs: leaf 1375, direct 10177
            # per 8-group chunk, cand (72923, 23589, 2534) -> 459 ms/pass,
            # tools/hier_probe.py sweep)
            approx_cap=1024 if big_bh else 512,
            direct_body_cap=16384 if big_bh else 1024,
            frontier_cap=1024 if big_bh else 512,
            leaf_list_cap=2048 if big_bh else 256,
            bh_hier_cand_caps=(131072, 32768, 4096),
            # need-fit group/node caps for the big bh run: the tunnel's
            # remote-compile wall is cap-volume-dependent (hier_probe
            # compiles at group_cap 2049 where the default 16448 died —
            # PERFORMANCE.md round-5 BH section); N=1M two-disk needs
            # 2048 groups and 179,375 nodes
            group_cap=2080 if big_bh else 0,
            node_capacity=(1 << 20) if big_bh else 0,
            # the FUSED one-step graph at N=1M hier caps overruns the
            # tunnel's remote compile helper (HTTP 500 after ~56 min,
            # twice, round 5); the 4-executable phase-split stream
            # compiles in minutes and is trajectory-identical
            bh_stream_split=big_bh,
            mesh_level=10 if args.small else 12,
            # rect mesh: the scene is 2400x800 in a 2404^2 root quad — half
            # the rows covers y in [-201, 1001] with margin and halves the
            # padded-grid FFT/deposit/interp work (PERFORMANCE.md)
            mesh_ny=0 if args.small else 2048,
            # round-4 point: CIC-deconvolved kernel + split 2.5h + band 128:
            # measured mean force error 1.88e-4 / p99 1.4e-3 at N=1M vs
            # exact (tools/r5_experiments.py acc) — 1.9x BETTER than the BH
            # theta=0.5 point (3.6e-4) the metric names, while the halved
            # band shrinks the tri-diagonal pair volume 2x (band pass
            # 32.7 -> 7.5 ms measured at N=1M). NGP deposit (order 1) was
            # measured DEAD at this level: mean 1.8e-2 plain / 8.9e-3
            # interlaced, regardless of band/rescue (assignment aliasing,
            # not coverage) — the r5 sweep results live in PERFORMANCE.md.
            mesh_split=4.0 if args.small else 2.5,
            mesh_band=256 if args.small else 128,
            mesh_rescue=4 if args.small else 8,
            mesh_chunk=min(16384, cap),
            # round-5: compact polynomial short/long switch — measured
            # BETTER accuracy than exp4 (mean 1.70e-4 vs 1.88e-4 at N=1M)
            # and ~3x cheaper band pair math (tools/r6_experiments.py
            # switch; PERFORMANCE.md round-5 section)
            mesh_switch="poly4",
        )
        params = Params.default(theta=args.theta)
        eng = Engine(cfg, params, solver=args.solver,
                     integrator=args.integrator, seed=3)
        n2 = n // 5
        eng.reset_default_scene(n1=n - n2, n2=n2)

        # bh at scale steps via step_stream (n single-step executables): a
        # lax.scan whose body holds the hier traversal kernel-faults the TPU
        # worker at N=1M even with one traversal instance per executable
        # (the scan fault, PERFORMANCE.md round 4); the same graph as its
        # own executable runs fine and the extra dispatch is ~5 ms against
        # a ~0.5 s step.
        advance = eng.step_stream if big_bh else eng.step

        # Warmup: compile the step (scan path: the n-step scan — must use
        # the SAME step count as the measurement since each n_steps compiles
        # its own scan; stream path: the seed + single-step executables)
        # + let cap auto-retune settle. A host value pull forces real
        # completion (the backend's dispatch is async).
        t0 = time.perf_counter()
        advance(args.steps)
        float(eng.state.pos[0, 0])
        if args.solver == "bh" and eng.tighten_caps():
            # right-size the static list caps to this scene's measured
            # needs (8x at N=100k) and recompile before measuring
            advance(args.steps)
            float(eng.state.pos[0, 0])
        warmup_s = time.perf_counter() - t0

        # Best of a few warm trials: first executions through the TPU tunnel
        # can read far slower than steady state (see PERFORMANCE.md).
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            advance(args.steps)
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
    acc_note = ("force err 1.9e-4 (1.9x better than BH theta=0.5)"
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
    if args.solver == "pm" and not args.small and not args.no_phases:
        try:
            print_roofline(eng, args, 1e3 * dt / args.steps)
        except Exception as e:  # pragma: no cover - keep the JSON line good
            print(f"# roofline table failed: {str(e)[:200]}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
