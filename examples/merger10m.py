"""BASELINE config[4]: multi-galaxy merger on a device mesh.

Four (or ``--galaxies``) galaxy disks fall into a common merger; the state
is domain-decomposed over every visible device and stepped with the
sharded P3M solver (``tpu_nbody/parallel/sharded_pm.py``). On real
multi-chip hardware run it at full size; on this environment validate the
identical program small on a virtual CPU mesh:

    python examples/merger10m.py --devices 8 --n 20000 --steps 16   # CPU mesh
    python examples/merger10m.py --n 10000000 --steps 100           # v5e pod

Writes a GIF when --out is given (frames rendered on device).
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--galaxies", type=int, default=4)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (0 = use the "
                         "real devices)")
    ap.add_argument("--reshard-every", type=int, default=8)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp
    import numpy as np

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.models import scenes
    from tpu_nbody.parallel.engine import ShardedEngine
    from tpu_nbody.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_dev = len(jax.devices())
    cap = 1 << (args.n - 1).bit_length()
    small = args.n < 100_000
    cfg = SimConfig(capacity=cap,
                    mesh_level=9 if small else 12,
                    mesh_band=64 if small else 512,
                    mesh_split=4.0 if small else 6.0,
                    mesh_chunk=min(16384, cap // n_dev))
    params = Params.default()
    eng = ShardedEngine(cfg, params, mesh=mesh, solver="pm",
                        reshard_every=args.reshard_every)

    p, v, m = scenes.multi_galaxy_merger(
        jax.random.PRNGKey(3), n_total=args.n, n_galaxies=args.galaxies,
        G=float(params.G))
    eng.set_bodies(p, v, m)
    print(f"# devices={n_dev} n={args.n} cap={cap} "
          f"galaxies={args.galaxies} backend={jax.default_backend()}")

    frames = []
    spf = max(1, args.steps // max(args.frames, 1))
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        eng.step(min(spf, args.steps - done))
        done += spf
        stats = eng.stats(potential=False)
        print(f"step {done:5d}  n_alive={int(stats['n_alive'])}  "
              f"KE={float(stats['kinetic']):.3e}", flush=True)
        if args.out:
            from tpu_nbody.ops import render
            fb = render.render_frame(
                eng.state.pos, eng.state.vel, eng.state.mass,
                eng.state.alive, width=400, height=300,
                view_x=0.0, view_y=0.0, zoom=400.0 / cfg.world_w,
                mode="speed", speed_scale=1 / 300.0, size_mass_scale=1e-4)
            frames.append(np.asarray(render.to_uint8(fb)))
    dt = time.perf_counter() - t0
    ups = args.n * args.steps / dt
    print(f"# {dt:.1f}s for {args.steps} steps -> {ups/1e6:.2f}M updates/s")

    if args.out and frames:
        from tpu_nbody.viewer import write_gif
        write_gif(args.out, frames, fps=8)
        print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
