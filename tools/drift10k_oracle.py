"""Float64 oracle for the official 10k-step drift benchmark (VERDICT item 2).

Integrates the canonical two-disk scene (IDENTICAL initial conditions to
``examples/drift_benchmark.py``: Engine(seed=3).reset_default_scene) with
the reference's exact KDK step structure (``BarnesHutAlg.kt:405-439``) and
exact float64 all-pairs softened forces, reporting energy / Lz drift every
1000 steps. CPU-only; run alongside the TPU solver runs:

    python tools/drift10k_oracle.py --n 2000 --steps 10000

The step math is a jitted float64 JAX scan (this box has ONE cpu core; the
NumPy transliteration in tests/oracle.py — against which step 0 is
cross-checked below — costs ~2-4 s/step at N=5000, which does not finish
inside a round). f64 + identical KDK structure make the two implementations
interchangeable as oracles; the cross-check proves it.
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
    ap.add_argument("--dt", type=float, default=None,
                    help="override Params.dt (reference default 0.005)")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine

    sys.path.insert(0, "tests")
    from oracle import exact_accel as np_exact_accel

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap)
    params = Params.default(merge_min_dist=0.0)
    if args.dt is not None:
        params = params.replace(dt=args.dt)
    eng = Engine(cfg, params, solver="allpairs", integrator="kdk", seed=3)
    n2 = args.n // 5
    eng.reset_default_scene(n1=args.n - n2, n2=n2)
    alive = np.asarray(eng.state.alive)
    pos = jnp.asarray(np.asarray(eng.state.pos)[alive], jnp.float64)
    vel = jnp.asarray(np.asarray(eng.state.vel)[alive], jnp.float64)
    mass = jnp.asarray(np.asarray(eng.state.mass)[alive], jnp.float64)
    G, soft2, dt = (float(params.G), float(params.soft2), float(params.dt))

    @jax.jit
    def accel(pos):
        # d_ii = 0 makes the self-term vanish exactly (soft2 keeps w finite),
        # same as tests/oracle.py's fill_diagonal(w, 0).
        d = pos[None, :, :] - pos[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + soft2
        w = mass[None, :] / (r2 * jnp.sqrt(r2))
        return G * jnp.einsum("ij,ijd->id", w, d)

    # cross-check the jitted f64 force against the independent NumPy oracle
    a_np = np_exact_accel(np.asarray(pos), np.asarray(mass), G, soft2)
    a_jx = np.asarray(accel(pos))
    xerr = np.max(np.linalg.norm(a_jx - a_np, axis=1)
                  / (np.linalg.norm(a_np, axis=1) + 1e-300))
    assert xerr < 1e-12, f"f64 oracle cross-check failed: {xerr}"

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_block(pos, vel, k):
        def one(carry, _):
            pos, vel = carry
            a = accel(pos)
            vel = vel + a * (dt / 2)          # BarnesHutAlg.kt:412-416
            pos = pos + vel * dt              # :419-421
            a2 = accel(pos)                   # 2nd tree+force pass :426
            vel = vel + a2 * (dt / 2)         # :429-432
            return (pos, vel), None
        (pos, vel), _ = jax.lax.scan(one, (pos, vel), None, length=k)
        return pos, vel

    @jax.jit
    def energy(pos, vel):
        ke = 0.5 * jnp.sum(mass * jnp.sum(vel * vel, axis=1))
        d = pos[None, :, :] - pos[:, None, :]
        r2 = jnp.sum(d * d, axis=-1) + soft2
        pe_m = mass[None, :] * mass[:, None] / jnp.sqrt(r2)
        pe = -G * 0.5 * (jnp.sum(pe_m) - jnp.sum(mass * mass) / soft2 ** 0.5)
        return ke + pe

    @jax.jit
    def lz(pos, vel):
        return jnp.sum(mass * (pos[:, 0] * vel[:, 1]
                               - pos[:, 1] * vel[:, 0]))

    e0 = float(energy(pos, vel))
    l0 = float(lz(pos, vel))
    print(f"# oracle f64 N={pos.shape[0]} E0={e0:.6e} Lz0={l0:.6e} "
          f"(np cross-check {xerr:.1e})", flush=True)

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        k = min(args.report_every, args.steps - done)
        pos, vel = run_block(pos, vel, k)
        done += k
        de = abs(float(energy(pos, vel)) - e0) / abs(e0)
        dl = abs(float(lz(pos, vel)) - l0) / max(abs(l0), 1e-30)
        print(json.dumps({
            "step": done, "energy_drift": round(de, 8),
            "Lz_drift": round(dl, 8),
            "elapsed_s": round(time.perf_counter() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
