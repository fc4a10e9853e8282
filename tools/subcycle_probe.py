"""F_long subcycling probe: staleness accuracy + end-to-end timing at N=1M.

VERDICT r4 item 2: the long-range mesh force is smooth in time, so the
deposit+FFT (~78 ms of the ~130 ms N=1M step) can be refreshed every K
steps while band+rescue stay per-step. This probe measures what that
staleness actually costs on the bench scene, and what it buys.

``acc`` mode — isolated staleness error, no trajectory feedback:
advance the TRUE trajectory with the fresh solver; build the mesh state
(grids + deposit snapshot + heavy mask, ops/mesh.py pm_mesh_state) at
step 0; evaluate the subcycled force at the step-s positions through the
SAME sorted frame (exactly how the engine's scan uses it between
resorts); compare against the exact all-pairs force at those positions.
Also reports the fresh heavy-direct point (s=0) and self_correct on/off.

``time`` mode — ms/step of the full subcycled engine at the bench config
for K in --ks, measured like bench.py (warm best-of trials).

Usage:
    python tools/subcycle_probe.py acc  --n 1000000 --stale 0 1 3 7
    python tools/subcycle_probe.py time --n 1000000 --ks 1 2 4 8
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


BENCH_MESH = dict(mesh_level=12, mesh_ny=2048, mesh_split=2.5,
                  mesh_band=128, mesh_rescue=8)


def bench_cfg(cap, **over):
    from tpu_nbody.config import SimConfig
    kw = dict(capacity=cap, max_depth=14, group_chunk=64,
              mesh_chunk=min(16384, cap), **BENCH_MESH)
    kw.update(over)
    return SimConfig(**kw)


def make_engine(n, **cfg_over):
    from tpu_nbody.config import Params
    from tpu_nbody.engine import Engine
    cap = 1 << (n - 1).bit_length()
    cfg = bench_cfg(cap, **cfg_over)
    eng = Engine(cfg, Params.default(), solver="pm",
                 integrator="kdk_reuse", seed=3)
    n2 = n // 5
    eng.reset_default_scene(n1=n - n2, n2=n2)
    return eng


def exp_acc(args):
    from tpu_nbody.ops import forces, mesh as mesh_ops
    from tpu_nbody.ops import morton

    n = args.n
    eng = make_engine(n)  # fresh solver advances the true trajectory
    cfg = eng.cfg
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    soft2 = jnp.float32(1.0)
    G = 80.0
    smax = max(args.stale)
    M = args.interval or (smax + 1)
    # warm the scene a little so velocities are realistic; record a state
    # one refresh interval BEFORE the build point (for the extrapolation
    # slope), then states X_0 .. X_smax along the true trajectory
    eng.step(3)
    prev_state = eng.state
    eng.step(M)
    states = [eng.state]
    for _ in range(smax):
        eng.step(1)
        states.append(eng.state)

    # one sorted frame for everything, from X_0 (= the engine's persistent
    # sort between resorts)
    x0 = states[0]
    codes = morton.hilbert_codes(x0.pos, origin, side, x0.alive)
    perm = jnp.argsort(codes, stable=True)

    kern = mesh_ops.kernel_hats_for(
        side, soft2, mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
        mesh_ny=cfg.mesh_ny, order=cfg.mesh_order)

    # NOTE kern and perm are jit ARGUMENTS everywhere below: closure
    # constants of this size are unimplemented on the tunnel compiler
    # (PERFORMANCE.md).
    @functools.partial(jax.jit, static_argnames=("heavy_cap", "has_prev"))
    def _build_state(pos, mass, alive, kern, perm, heavy_cap, prev=None,
                     has_prev=False):
        return mesh_ops.pm_mesh_state(
            pos[perm], jnp.where(alive, mass, 0.0)[perm], alive[perm],
            soft2, origin, side, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
            heavy_cap=heavy_cap, kernel=kern,
            prev=prev[0] if has_prev else None)

    def build_state(pos, mass, alive, heavy_cap, prev=None,
                    has_prev=False):
        return _build_state(pos, mass, alive, kern, perm, heavy_cap,
                            prev=prev, has_prev=has_prev)

    @functools.partial(jax.jit,
                       static_argnames=("heavy_cap", "self_correct"))
    def _stale_force(pos, mass, alive, kern, perm, ms, heavy_cap,
                     self_correct, frac=0.0):
        sp = pos[perm]
        acc, _ = mesh_ops.pm_accel_sorted(
            sp, mass[perm], alive[perm], G, soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            band=cfg.mesh_band, chunk=cfg.mesh_chunk,
            rescue_k=cfg.mesh_rescue, mesh_ny=cfg.mesh_ny, kernel=kern,
            mesh_state=ms, heavy_cap=heavy_cap, self_correct=self_correct,
            stale_frac=jnp.float32(frac))
        return acc[jnp.argsort(perm)]

    def stale_force(pos, mass, alive, ms, heavy_cap, self_correct,
                    frac=0.0):
        return _stale_force(pos, mass, alive, kern, perm, ms, heavy_cap,
                            self_correct, frac=frac)

    @jax.jit
    def _fresh_force(pos, mass, alive, kern):
        acc, _ = mesh_ops.pm_accel(
            pos, mass, alive, G, soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            band=cfg.mesh_band, chunk=cfg.mesh_chunk,
            rescue_k=cfg.mesh_rescue, mesh_ny=cfg.mesh_ny,
            return_stats=True, kernel=kern)
        return acc

    def fresh_force(pos, mass, alive):
        return _fresh_force(pos, mass, alive, kern)

    def report(tag, acc, ref, alive):
        sel = np.asarray(alive)
        rel = (np.linalg.norm(np.asarray(acc) - ref, axis=-1)
               / (np.linalg.norm(ref, axis=-1) + 1e-9))[sel]
        print(f"{tag:>34s} mean {rel.mean():9.2e}  p50 "
              f"{np.median(rel):9.2e}  p99 {np.percentile(rel, 99):9.2e}",
              flush=True)

    print(f"# staleness sweep n={n} bench config {BENCH_MESH}", flush=True)
    exact = {}
    for s in sorted(set(args.stale)):
        st = states[s]
        ref = forces.accel_allpairs(st.pos,
                                    jnp.where(st.alive, st.mass, 0.0), G,
                                    soft2, implementation="xla")
        exact[s] = np.asarray(ref * st.alive[:, None])

    st0 = states[0]
    report("fresh heavy=0 (bench today)",
           fresh_force(st0.pos, st0.mass, st0.alive), exact[0], st0.alive)
    for H in args.heavies:
        ms = build_state(st0.pos, st0.mass, st0.alive, H)
        msp = build_state(prev_state.pos, prev_state.mass,
                          prev_state.alive, H)
        mse = build_state(st0.pos, st0.mass, st0.alive, H, prev=msp,
                          has_prev=True)
        jax.block_until_ready(ms[1])
        for s in sorted(set(args.stale)):
            st = states[s]
            report(f"H={H} stale={s} plain",
                   stale_force(st.pos, st.mass, st.alive, ms, H, True),
                   exact[s], st.alive)
            if s:
                report(f"H={H} stale={s} extrap(M={M})",
                       stale_force(st.pos, st.mass, st.alive, mse, H,
                                   True, frac=s / M),
                       exact[s], st.alive)
        s = max(args.stale)
        st = states[s]
        report(f"H={H} stale={s} NO-selfcorr",
               stale_force(st.pos, st.mass, st.alive, ms, H, False),
               exact[s], st.alive)


def exp_time(args):
    n = args.n
    for K in args.ks:
        over = {} if K == 1 and args.heavies[0] == 0 else dict(
            pm_mesh_every=K, pm_heavy_cap=args.heavies[0])
        eng = make_engine(n, **over)
        t0 = time.perf_counter()
        eng.step(args.steps)
        float(eng.state.pos[0, 0])
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            eng.step(args.steps)
            float(eng.state.pos[0, 0])
            best = min(best, time.perf_counter() - t0)
        na = int(eng.state.n_alive())
        print(f"K={K:2d} H={args.heavies[0]:3d}  warmup {warm:6.1f}s  "
              f"{best * 1e3 / args.steps:7.2f} ms/step  "
              f"{na * args.steps / best / 1e6:6.2f}M updates/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["acc", "time"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--stale", type=int, nargs="+", default=[0, 1, 3, 7])
    ap.add_argument("--interval", type=int, default=0,
                    help="acc: emulated refresh interval M for the "
                         "extrapolated rows (0 = max stale + 1)")
    ap.add_argument("--heavies", type=int, nargs="+", default=[16])
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    {"acc": exp_acc, "time": exp_time}[args.exp](args)


if __name__ == "__main__":
    main()
