"""Float64 oracle for the official 10k-step drift benchmark (VERDICT item 4).

Integrates the canonical two-disk scene (IDENTICAL initial conditions to
``examples/drift_benchmark.py``: Engine(seed=3).reset_default_scene) with
the reference's exact KDK step structure (tests/oracle.py::kdk_step) and
exact float64 all-pairs forces, reporting energy / Lz drift every 1000
steps. CPU-only; run alongside the TPU solver runs:

    python tools/drift10k_oracle.py --n 2000 --steps 10000
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000)
    ap.add_argument("--steps", type=int, default=10_000)
    ap.add_argument("--report-every", type=int, default=1_000)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine

    sys.path.insert(0, "tests")
    from oracle import exact_accel, kdk_step

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap)
    params = Params.default(merge_min_dist=0.0)
    eng = Engine(cfg, params, solver="allpairs", integrator="kdk", seed=3)
    n2 = args.n // 5
    eng.reset_default_scene(n1=args.n - n2, n2=n2)
    alive = np.asarray(eng.state.alive)
    pos = np.asarray(eng.state.pos)[alive].astype(np.float64)
    vel = np.asarray(eng.state.vel)[alive].astype(np.float64)
    mass = np.asarray(eng.state.mass)[alive].astype(np.float64)
    G, soft2, dt = (float(params.G), float(params.soft2), float(params.dt))

    def energy(pos, vel, mass):
        ke = 0.5 * np.sum(mass * np.sum(vel * vel, axis=1))
        d = pos[None, :, :] - pos[:, None, :]
        r2 = np.sum(d * d, axis=-1) + soft2
        iu = np.triu_indices(len(pos), 1)
        pe = -G * np.sum(mass[iu[0]] * mass[iu[1]] / np.sqrt(r2[iu]))
        return ke + pe

    def lz(pos, vel, mass):
        return float(np.sum(mass * (pos[:, 0] * vel[:, 1]
                                    - pos[:, 1] * vel[:, 0])))

    e0 = energy(pos, vel, mass)
    l0 = lz(pos, vel, mass)
    print(f"# oracle f64 N={len(pos)} E0={e0:.6e} Lz0={l0:.6e}", flush=True)
    accel = lambda p, m: exact_accel(p, m, G, soft2)

    t0 = time.perf_counter()
    for step in range(1, args.steps + 1):
        pos, vel = kdk_step(pos, vel, mass, dt, accel)
        if step % args.report_every == 0:
            de = abs(energy(pos, vel, mass) - e0) / abs(e0)
            dl = abs(lz(pos, vel, mass) - l0) / max(abs(l0), 1e-30)
            print(json.dumps({
                "step": step, "energy_drift": round(de, 8),
                "Lz_drift": round(dl, 8),
                "elapsed_s": round(time.perf_counter() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
