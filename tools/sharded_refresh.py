"""Refresh the sharded-PM evidence at the CURRENT bench solver config.

VERDICT r4 item 8: the recorded virtual-8 sharded measurements predate the
round-4 rect-mesh / band-128 / deconvolved-kernel solver. This probe re-runs
the 8-virtual-device sharded pm step at the bench config (lvl 12, ny=2048,
split 2.5, band 128, rescue 8, deconvolve on) on N=1M-class shapes and
records:

* that the step executes and conserves slot identity (n_alive stable),
* the per-chip slab FFT work vs the single-chip transform (the rect+trim
  win carried over to the slab form),
* the analytic per-device array inventory at N=10M (what each v5e chip
  would hold), cross-checkable against the single-chip TPU measurement in
  tools/ (jax memory_stats).

Run (CPU, ~minutes; timing on the virtual mesh is NOT chip-grade and is
not recorded as such):

    python tools/sharded_refresh.py --devices 8 --n 1000000 --steps 2
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.models import scenes
    from tpu_nbody.parallel.engine import ShardedEngine

    n_dev = len(jax.devices())
    cap = 1 << (args.n - 1).bit_length()
    # the N=1M bench config (bench.py run_once), sharded
    cfg = SimConfig(capacity=cap, max_depth=14, mesh_level=12, mesh_ny=2048,
                    mesh_split=2.5, mesh_band=128, mesh_rescue=8,
                    mesh_chunk=min(16384, cap // n_dev))
    eng = ShardedEngine(cfg, Params.default(), solver="pm",
                        integrator="kdk_reuse", seed=3)
    n2 = args.n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=args.n - n2, n2=n2)
    eng.set_bodies(p, v, m)
    print(f"# devices={n_dev} n={args.n} cap={cap} bench config "
          f"(lvl12 ny2048 split2.5 band128 k8 deconv)", flush=True)
    n0 = int(eng.state.n_alive())
    t0 = time.perf_counter()
    eng.step(args.steps)
    ke = float(eng.stats(potential=False)["kinetic"])
    dt = time.perf_counter() - t0
    print(f"# {args.steps} steps in {dt:.1f}s (CPU virtual mesh — compile+"
          f"1-core execute; NOT a chip number)", flush=True)
    print(f"# n_alive {n0} -> {int(eng.state.n_alive())}  KE={ke:.3e}",
          flush=True)

    # per-chip slab FFT work at this config vs the single-chip transform
    nw, ny = 1 << cfg.mesh_level, cfg.mesh_ny
    grid, grid_y = 2 * nw, 2 * ny
    single = grid_y * grid          # trimmed rows scale both the same way
    slab = grid_y * grid // n_dev   # each chip owns grid_y/n_dev rows
    print(f"# mesh {grid_y}x{grid}: single-chip transform {single / 1e6:.1f}M"
          f" pts; per-chip slab {slab / 1e6:.1f}M pts (x{n_dev} chips, "
          f"reduce_scatter'd rows)", flush=True)

    # analytic per-device inventory at N=10M (cap 2^24, 8 chips)
    cap10 = 1 << 24
    shard = cap10 // 8
    soa = shard * (2 + 2 + 1 + 1 + 1) * 4       # pos vel mass alive(i32) perm
    acc = shard * 2 * 4
    slab_f = (grid_y // 8) * grid * 4 * 3       # rho slab + fx + fy slabs
    kern = grid_y * (grid // 2 + 1) * 8 // 8 * 3  # rfft kernels, slab share
    tot = soa + acc + slab_f + kern
    print(f"# per-chip @N=10M/8: SoA {soa / 2 ** 20:.0f} MiB + acc "
          f"{acc / 2 ** 20:.0f} MiB + mesh slabs {slab_f / 2 ** 20:.0f} MiB "
          f"+ kernel slabs {kern / 2 ** 20:.0f} MiB = {tot / 2 ** 20:.0f} "
          f"MiB of 16 GiB HBM", flush=True)


if __name__ == "__main__":
    main()
