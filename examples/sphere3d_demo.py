"""3D all-pairs demo — the reference GPU program's workload.

Reproduces ``src/main/kotlin/gpu/GPU.kt main()`` (lines 657-735): a 50k-body
3D sphere with tangential velocities + a 5e6-mass central body, integrated
with semi-implicit Euler under exact all-pairs forces, rendered with the
auto-orbiting camera (yaw advancing 0.25 rad/s, fixed 15 deg pitch) and the
speed color ramp, written as an animated GIF.

    python examples/sphere3d_demo.py --out sphere.gif --n 50000
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="sphere.gif")
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--steps-per-frame", type=int, default=1)
    ap.add_argument("--width", type=int, default=430)
    ap.add_argument("--height", type=int, default=180)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_nbody import viewer
    from tpu_nbody.config import Params
    from tpu_nbody.models import scenes3d
    from tpu_nbody.ops import forces, integrate, render
    from tpu_nbody.state import from_arrays

    pos, vel, mass = scenes3d.generate_sphere(jax.random.PRNGKey(1), args.n)
    state = from_arrays(pos, vel, mass)
    # GPU demo physics: G=80, dt=0.005, softening 1 (GPU.kt:36-41), no merge.
    params = Params.default(merge_min_dist=0.0)

    def accel(p, m, alive, prm):
        return forces.accel_allpairs(p, jnp.where(alive, m, 0.0), prm.G,
                                     prm.soft2)

    @jax.jit
    def step_n(state, params):
        def body(s, _):
            return integrate.euler_step(s, params, accel), None
        return jax.lax.scan(body, state, None,
                            length=args.steps_per_frame)[0]

    frames = []
    cam_angle = 0.0
    t0 = time.perf_counter()
    for i in range(args.frames):
        state = step_n(state, params)
        cam_angle += 0.25 * 0.016  # GPU.kt:680,707 at ~60 FPS frame time
        # world scaled into the viewport like the GL projection (GPU.kt:222)
        fb = render.render_frame_3d(
            state.pos / 8.0, state.vel, state.mass, state.alive,
            width=args.width, height=args.height, cam_angle=cam_angle,
            speed_scale=1.0 / 10_000.0, gain=0.6)
        frames.append(np.asarray(render.to_uint8(fb)))
        if (i + 1) % 15 == 0:
            print(f"frame {i + 1}/{args.frames}  "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
    viewer.write_gif(args.out, frames, fps=25)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
