"""Angular-momentum drift experiments for the PM solver (VERDICT r2 item 5).

The P3M mesh force with matched CIC deposit/interp + odd FD gradient is
exactly pairwise-ANTISYMMETRIC (linear momentum conserved, Hockney &
Eastwood ch. 5) but not CENTRAL: grid anisotropy applies a small random
torque per step and Lz random-walks (measured 1.21 over 10k steps at the
drift-benchmark config). Candidate mitigations, measured here on identical
ICs (two-disk N=2000, seed 3, dt=0.005, merge off):

  * interlace: second mesh pass on a half-cell-shifted grid, averaged —
    cancels the leading-order anisotropic assignment aliasing;
  * split radius a: larger a hands more of each pair force to the exactly
    central short-range sum (torque noise ~ mesh share of the pair force);
  * mesh_level: finer grid shrinks h at fixed a/h;
  * TSC (order-3) assignment (round 4, VERDICT r3 item 6): smoother window
    -> higher-order aliasing suppression, the standard next rung of this
    error family (9 scatter items/body instead of 4 — an accuracy knob,
    not a throughput one).

    python tools/lz_experiments.py --steps 2000
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000)
    ap.add_argument("--steps", type=int, default=2_000)
    ap.add_argument("--block", type=int, default=500)
    ap.add_argument("--filter", default="",
                    help="only run configs whose tag contains this substring")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine
    from tpu_nbody.ops import mesh as mesh_ops

    cap = 1 << (args.n - 1).bit_length()
    base = SimConfig(capacity=cap, max_depth=12, mesh_level=11,
                     mesh_band=128, mesh_chunk=min(32768, cap))
    params = Params.default(merge_min_dist=0.0)
    eng = Engine(base, params, solver="allpairs")
    n2 = args.n // 5
    eng.reset_default_scene(n1=args.n - n2, n2=n2)
    pos0 = jnp.asarray(eng.state.pos)
    vel0 = jnp.asarray(eng.state.vel)
    mass = jnp.asarray(eng.state.mass)
    alive = jnp.asarray(eng.state.alive)
    G, soft2, dt = float(params.G), float(params.soft2), float(params.dt)

    ox, oy = base.root_center

    def run(tag, level, split, band, rescue, interlace, order=2):
        if args.filter and args.filter not in tag:
            return
        origin = (ox - base.root_half, oy - base.root_half)
        side = 2.0 * base.root_half

        def accel(p):
            acc, _ = mesh_ops.pm_accel(
                p, mass, alive, G, soft2, origin, side, mesh_level=level,
                split_cells=split, band=band, chunk=base.mesh_chunk,
                interlace=interlace, rescue_k=rescue, order=order,
                return_stats=True)
            return acc

        @jax.jit
        def block(pos, vel):
            def one(c, _):
                pos, vel = c
                a = accel(pos)
                vel = vel + a * (dt / 2)
                pos = pos + vel * dt
                vel = vel + accel(pos) * (dt / 2)
                return (pos, vel), None
            return jax.lax.scan(one, (pos, vel), None, length=args.block)[0]

        @jax.jit
        def lz(pos, vel):
            return jnp.sum(mass * (pos[:, 0] * vel[:, 1]
                                   - pos[:, 1] * vel[:, 0]))

        pos, vel = pos0, vel0
        l0 = float(lz(pos, vel))
        t0 = time.perf_counter()
        done = 0
        while done < args.steps:
            pos, vel = block(pos, vel)
            done += args.block
        dl = abs(float(lz(pos, vel)) - l0) / max(abs(l0), 1e-30)
        print(json.dumps({
            "config": tag, "steps": done, "Lz_drift": round(dl, 6),
            "elapsed_s": round(time.perf_counter() - t0, 1)}), flush=True)

    run("baseline lvl11 a=4h band128 k4", 11, 4.0, 128, 4, False)
    run("interlace", 11, 4.0, 128, 4, True)
    run("split a=8h", 11, 8.0, 128, 8, False)
    run("lvl12 a=4h", 12, 4.0, 128, 4, False)
    run("interlace + a=8h", 11, 8.0, 128, 8, True)
    # round-4 TSC rows (VERDICT r3 item 6)
    run("tsc lvl11 a=4h", 11, 4.0, 128, 4, False, order=3)
    run("tsc + interlace", 11, 4.0, 128, 4, True, order=3)
    run("tsc + a=8h + interlace", 11, 8.0, 128, 8, True, order=3)


if __name__ == "__main__":
    main()
