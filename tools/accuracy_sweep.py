"""P3M accuracy sweep vs exact all-pairs on the bench scene (TPU).

Measures mean/p99 relative force error of ``pm_accel`` configs against the
exact softened all-pairs force at N (default 50k, two-disk bench scene).
Used to pick the config that reaches the BH theta=0.5-equivalent accuracy
point (mean rel err <= 3.6e-4, BASELINE.md:16) at the lowest step cost.

Usage: python tools/accuracy_sweep.py [--n 50000] \
           [--configs "12:4:256,12:5:384,12:6:512"]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tpu_nbody.config import SimConfig
from tpu_nbody.models import scenes
from tpu_nbody.ops import forces, mesh as mesh_ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--configs", type=str,
                    default="12:4:256,12:5:384,12:6:512,11:6:384,11:8:512")
    ap.add_argument("--interlace", action="store_true")
    ap.add_argument("--rescue", type=int, default=0)
    ap.add_argument("--rescue-hot", type=int, default=0)
    ap.add_argument("--ny", type=int, default=0)
    args = ap.parse_args()

    n = args.n
    cap = 1 << (n - 1).bit_length()
    cfg = SimConfig(capacity=cap)
    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half), jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)

    n2 = n // 5
    p, v, m = scenes.default_two_disk_scene(jax.random.PRNGKey(3),
                                            n1=n - n2, n2=n2)
    pos = jnp.zeros((cap, 2), jnp.float32).at[:n].set(p)
    mass = jnp.zeros((cap,), jnp.float32).at[:n].set(m)
    alive = jnp.arange(cap) < n
    G, soft2 = 80.0, 1.0

    ref = forces.accel_allpairs(pos, mass, G, soft2, implementation="xla")
    ref = np.asarray(ref * alive[:, None])
    refn = np.linalg.norm(ref, axis=-1)
    sel = np.asarray(alive)
    print(f"# n={n} cap={cap} backend={jax.default_backend()} "
          f"interlace={args.interlace} rescue={args.rescue}")
    print(f"{'level:split:band':>18s} {'mean':>10s} {'p50':>10s} {'p99':>10s}")

    for spec in args.configs.split(","):
        lvl, split, band = spec.split(":")
        lvl, split, band = int(lvl), float(split), int(band)
        acc = np.asarray(mesh_ops.pm_accel(
            pos, mass, alive, G, jnp.float32(soft2), origin, side,
            mesh_level=lvl, split_cells=split, band=band, chunk=16384,
            interlace=args.interlace, rescue_k=args.rescue,
            rescue_k_hot=args.rescue_hot, mesh_ny=args.ny))
        rel = (np.linalg.norm(acc - ref, axis=-1) / (refn + 1e-9))[sel]
        print(f"{spec:>18s} {rel.mean():10.2e} {np.median(rel):10.2e} "
              f"{np.percentile(rel, 99):10.2e}", flush=True)


if __name__ == "__main__":
    main()
