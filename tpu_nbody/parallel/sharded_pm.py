"""Multi-chip P3M: sharded deposit + psum mesh + halo-exchanged band.

Scales the :mod:`tpu_nbody.ops.mesh` solver over a device mesh:

* Bodies are DOMAIN-DECOMPOSED along ``"b"``: :func:`reshard_by_hilbert`
  globally sorts bodies by Hilbert code so each shard owns a contiguous
  curve segment (a compact spatial domain). Within a step each shard
  re-sorts locally (cheap) — the decomposition itself is refreshed by
  calling reshard every K steps, K sized so bodies cannot drift farther
  than the short-range radius across a domain boundary between reshards.
* Deposit: each shard CIC-deposits its bodies into a local density grid;
  one ``psum`` over ICI makes the global grid resident on every chip.
* FFT force grids are computed redundantly per chip (the grid is small
  relative to bodies at scale; a slab-decomposed distributed FFT is the
  round-2 upgrade) and interpolated locally — zero per-body communication.
* Short-range band: each shard's sorted block exchanges a ``band``-row halo
  with its ring neighbors via ``ppermute`` — with Hilbert domain
  decomposition, the ring neighbors ARE the spatial neighbors along the
  curve, so pairs spanning the shard boundary are covered exactly like
  in-shard band pairs.

This is the SURVEY §5.7/§5.8 design point: body tiles ride ICI collectives
(`psum`, `ppermute`) instead of the reference's nonexistent distributed
backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.ops import mesh as mesh_ops
from tpu_nbody.ops import morton
from tpu_nbody.parallel.mesh import BODY_AXIS
from tpu_nbody.parallel.sharded import _merge_sharded
from tpu_nbody.state import SimState


def _pm_accel_local(pos, mass, alive, G, soft2, origin, root_side, *,
                    mesh_level, split_cells, band, chunk, axis, n_shards,
                    kernel=None):
    """P3M acceleration for the local body shard (inside shard_map)."""
    dtype = pos.dtype
    origin = jnp.asarray(origin, dtype)
    root_side = jnp.asarray(root_side, dtype)
    nw = 1 << mesh_level
    grid = 2 * nw
    h = root_side / nw
    a = split_cells * h

    spos, smass, salive, unsort = mesh_ops._hilbert_sort(
        pos, mass, alive, origin, root_side)

    # ---- local CIC deposit, then global density via psum ----
    scaled = (spos - origin) / h
    u = scaled - 0.5
    base = jnp.floor(u).astype(jnp.int32)
    frac = u - base.astype(dtype)
    bx0 = jnp.clip(base[:, 0], 0, nw - 1)
    by0 = jnp.clip(base[:, 1], 0, nw - 1)
    bx1 = jnp.clip(base[:, 0] + 1, 0, nw - 1)
    by1 = jnp.clip(base[:, 1] + 1, 0, nw - 1)
    wx1, wy1 = frac[:, 0], frac[:, 1]
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    idx4 = (by0 * grid + bx0, by0 * grid + bx1,
            by1 * grid + bx0, by1 * grid + bx1)
    w4 = (wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1)
    rho = jnp.zeros((grid * grid,), dtype)
    for idx, w in zip(idx4, w4):
        rho = rho.at[idx].add(smass * w)
    rho = jax.lax.psum(rho.reshape(grid, grid), axis)

    # ---- FFT force grids (replicated compute) + local CIC interp ----
    if kernel is None:
        kernel = mesh_ops._kernel_hats(grid, h, soft2, a, dtype)
    kx_hat, ky_hat, _ = kernel
    rho_hat = jnp.fft.rfft2(rho)
    fx = jnp.fft.irfft2(rho_hat * kx_hat, s=(grid, grid))
    fy = jnp.fft.irfft2(rho_hat * ky_hat, s=(grid, grid))
    fgrid = jnp.stack([fx, fy], axis=-1).reshape(grid * grid, 2)
    acc_mesh = jnp.zeros_like(spos)
    for idx, w in zip(idx4, w4):
        acc_mesh = acc_mesh + fgrid[idx] * w[:, None]

    # ---- short-range band with ring halo exchange ----
    S = band
    fields = jnp.concatenate([spos, smass[:, None]], axis=1)
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    # halo_left = last S rows of the PREVIOUS shard, etc. Ring wrap would
    # create spurious pairs between the global first/last shard; their
    # bodies are spatially unrelated, so mask the wrap edges.
    me = jax.lax.axis_index(axis)
    halo_left = jax.lax.ppermute(fields[-S:], axis, fwd)
    halo_right = jax.lax.ppermute(fields[:S], axis, bwd)
    halo_left = jnp.where(me == 0, 0.0, 1.0) * halo_left
    halo_right = jnp.where(me == n_shards - 1, 0.0, 1.0) * halo_right
    ext = jnp.concatenate([halo_left, fields, halo_right])
    acc_short = mesh_ops._band_short_range(
        ext[:, :2], ext[:, 2], soft2, a, band=S, chunk=chunk)[S:S + pos.shape[0]]

    acc = (acc_mesh + acc_short) * salive[:, None].astype(dtype)
    return (G * acc)[unsort]


def reshard_by_hilbert(state: SimState, mesh: Mesh, cfg: SimConfig,
                       axis: str = BODY_AXIS) -> SimState:
    """Globally order bodies along the Hilbert curve and re-shard.

    After this, shard s holds the s-th contiguous curve segment — a compact
    spatial domain — which the sharded P3M step's halo exchange relies on.
    Dead slots sort to the end (the last shard). Host-orchestrated (gathers
    to one device); call every K steps, not inside the step loop.
    """
    from tpu_nbody.parallel.mesh import shard_state

    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    codes = morton.hilbert_codes(state.pos, jnp.asarray(origin),
                                 jnp.asarray(2.0 * cfg.root_half),
                                 state.alive)
    order = jnp.argsort(codes, stable=True)
    state = state._replace(
        pos=state.pos[order], vel=state.vel[order],
        mass=jnp.where(state.alive[order], state.mass[order], 0.0),
        alive=state.alive[order])
    return shard_state(state, mesh, axis)


def make_sharded_pm_step(mesh: Mesh, cfg: SimConfig, *,
                         integrator: str = "kdk",
                         heavy_cap_local: int = 16, axis: str = BODY_AXIS):
    """Jitted multi-chip P3M step(state, params, n_steps) on ``mesh``."""
    n_shards = mesh.shape[axis]
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half

    def accel(pos, mass, alive, params, kernel):
        return _pm_accel_local(
            pos, jnp.where(alive, mass, 0.0), alive, params.G, params.soft2,
            origin, side, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, band=cfg.mesh_band,
            chunk=min(cfg.mesh_chunk, cfg.capacity // n_shards),
            axis=axis, n_shards=n_shards, kernel=kernel)

    def local_step(state: SimState, params: Params, kernel):
        a = accel(state.pos, state.mass, state.alive, params, kernel)
        half = params.dt * 0.5
        if integrator == "kdk":
            vel = state.vel + a * half
            pos = state.pos + vel * params.dt
            a2 = accel(pos, state.mass, state.alive, params, kernel)
            vel = vel + a2 * half
        elif integrator == "euler":
            vel = state.vel + a * params.dt
            pos = state.pos + vel * params.dt
        else:
            raise ValueError(integrator)
        state = state._replace(pos=pos, vel=vel, step=state.step + 1)
        return _merge_sharded(state, params, axis=axis, n_shards=n_shards,
                              heavy_cap_local=heavy_cap_local)

    sharded = P(axis)
    sharded2 = P(axis, None)
    state_specs = SimState(pos=sharded2, vel=sharded2, mass=sharded,
                           alive=sharded, step=P())
    param_specs = jax.tree.map(lambda _: P(), Params.default())

    def one(state, params, kernel):
        return jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, param_specs, (P(), P(), P())),
            out_specs=(state_specs, P()),
            check_vma=False,
        )(state, params, kernel)

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def step_n(state: SimState, params: Params, n_steps: int = 1):
        """Returns (state, heavy_need) — max over the executed steps."""
        # Long-range kernel FFTs hoisted out of the step loop (they depend
        # only on static config + soft2); inside the scan they are loop
        # constants, replicated across shards.
        kernel = mesh_ops.kernel_hats_for(
            side, params.soft2, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, dtype=cfg.jdtype)
        state, heavy = one(state, params, kernel)
        if n_steps == 1:
            return state, heavy

        def body(carry, _):
            s, h = carry
            s, h2 = one(s, params, kernel)
            return (s, jnp.maximum(h, h2)), None

        (state, heavy), _ = jax.lax.scan(body, (state, heavy), None,
                                         length=n_steps - 1)
        return state, heavy

    return step_n
