"""On-device measurement: Pallas band kernel vs the XLA band pass.

Closes the measurement the band-Pallas commit left pending
(``ops/band_pallas.py`` docstring): same Hilbert-sorted N=1M SoA, same
band=128 block-tridiagonal coverage, timed with the chained-salt
discipline this backend requires (vary an input per call, one host pull
at the end — PERFORMANCE.md). Also checks numerical agreement on device.

    python tools/band_pallas_micro.py --n 1000000 --iters 10
"""

from __future__ import annotations

import argparse
import time


def chained_time(fn, iters, label):
    import jax.numpy as jnp
    # rebind s through the warm-ups so the timed chain starts from a value
    # no prior call has seen (the tunnel memoizes identical calls —
    # ADVICE r4: an unrebound warm-up made timed call #1 a cache hit)
    s = jnp.float32(1.000001)
    s = fn(s)
    float(s)
    s = fn(s * 1.000001)
    float(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s * 1.000001)
    float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:28s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tpu_nbody.config import Params, SimConfig
    from tpu_nbody.engine import Engine
    from tpu_nbody.ops import band_pallas
    from tpu_nbody.ops import mesh as mesh_ops

    cap = 1 << (args.n - 1).bit_length()
    cfg = SimConfig(capacity=cap, mesh_level=12, mesh_ny=2048,
                    mesh_split=2.5, mesh_band=128,
                    mesh_chunk=min(args.chunk, cap))
    params = Params.default()
    eng = Engine(cfg, params, solver="allpairs")
    n2 = args.n // 5
    eng.reset_default_scene(n1=args.n - n2, n2=n2)
    st = eng.state

    ox, oy = cfg.root_center
    origin = jnp.asarray((ox - cfg.root_half, oy - cfg.root_half),
                         jnp.float32)
    side = jnp.asarray(2.0 * cfg.root_half, jnp.float32)
    h = float(side) / (1 << cfg.mesh_level)
    a = cfg.mesh_split * h
    soft2 = float(params.soft2)

    spos, smass, _, _ = jax.jit(mesh_ops._hilbert_sort)(
        st.pos, st.mass, st.alive, origin, side)
    jax.block_until_ready((spos, smass))

    @jax.jit
    def xla_band(sp, sm, s):
        acc = mesh_ops._band_short_range(
            sp + s * 1e-6, sm, jnp.float32(soft2), a,
            band=cfg.mesh_band, chunk=min(cfg.mesh_chunk, cap))
        return acc[0, 0] + s

    @jax.jit
    def pl_band(sp, sm, s):
        acc = band_pallas.band_short_range_pallas(
            sp + s * 1e-6, sm, jnp.float32(soft2), jnp.float32(a))
        return acc[0, 0] + s

    # numerical agreement first, JITTED (eager is seconds-per-op on this
    # backend — ADVICE r4; s=0 keeps the salted graphs reusable here)
    @jax.jit
    def agree(sp, sm):
        ax = mesh_ops._band_short_range(
            sp, sm, jnp.float32(soft2), a, band=cfg.mesh_band,
            chunk=min(cfg.mesh_chunk, cap))
        apl = band_pallas.band_short_range_pallas(
            sp, sm, jnp.float32(soft2), jnp.float32(a))
        scale = jnp.max(jnp.abs(ax))
        return jnp.max(jnp.abs(ax - apl)), scale

    pallas_ok = True
    try:
        err, scale = agree(spos, smass)
        print(f"max |xla - pallas| / max|xla| = "
              f"{float(err) / max(float(scale), 1e-30):.3e} "
              f"(scale {float(scale):.3e})", flush=True)
    except Exception as e:
        print(f"PALLAS COMPILE/RUN FAILED: {str(e)[:300]}", flush=True)
        pallas_ok = False

    t_x = chained_time(lambda s: xla_band(spos, smass, s), args.iters,
                       "xla band (lax.map blocks)")
    if pallas_ok:
        t_p = chained_time(lambda s: pl_band(spos, smass, s), args.iters,
                           "pallas band (1024 tiles)")
        print(f"ratio pallas/xla = {t_p / t_x:.2f}x", flush=True)


if __name__ == "__main__":
    main()
