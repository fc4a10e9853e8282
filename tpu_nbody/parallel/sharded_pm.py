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
* The potential solve is a slab-decomposed distributed FFT
  (:func:`_slab_fft_phi`): reduce-scatter the density rows, per-chip row
  FFTs, an ``all_to_all`` transpose, per-chip column FFTs against this
  chip's kernel column slice, and back — per-chip FFT work drops P-fold
  versus the round-1 replicated transform. The 6th-order FD gradient runs
  on the slabs with a 3-row ``ppermute`` halo, and only the world window
  (nw+1)^2 of (fx, fy) is ``all_gather``-ed for local interpolation.
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


def _slab_fft_phi(rho_local, phi_hat, *, axis, n_shards, grid):
    """Distributed potential solve: slab-decomposed 2D FFT convolution.

    Round-1 computed the full padded-grid FFT redundantly on every chip;
    this is the round-2 slab decomposition (VERDICT item 8): per-chip FFT
    work drops P-fold.

    rho_local: this chip's PARTIAL density (grid, grid) (sum over chips =
    the global grid). Steps, all inside shard_map:

    1. reduce-scatter rows: each chip gets its summed row slab
       (grid/P, grid) — cheaper than the old full psum.
    2. rfft along rows (local).
    3. all_to_all transpose to column slabs (grid, hwp/P), where hwp pads
       the rfft half-spectrum width grid/2+1 to a multiple of P.
    4. complex FFT along columns (local), multiply by this chip's column
       slice of the potential kernel phî, inverse FFT along columns.
    5. all_to_all back to row slabs, irfft along rows -> φ row slab
       (grid/P, grid).
    """
    P_ = n_shards
    hw = grid // 2 + 1
    hwp = -(-hw // P_) * P_
    me = jax.lax.axis_index(axis)

    slab = jax.lax.psum_scatter(rho_local, axis, scatter_dimension=0,
                                tiled=True)                 # (grid/P, grid)
    rh = jnp.fft.rfft(slab, axis=1)                          # (grid/P, hw)
    rh = jnp.pad(rh, ((0, 0), (0, hwp - hw)))
    cols = jax.lax.all_to_all(rh, axis, split_axis=1, concat_axis=0,
                              tiled=True)                    # (grid, hwp/P)
    ch = jnp.fft.fft(cols, axis=0)
    ph = jnp.pad(phi_hat, ((0, 0), (0, hwp - hw)))
    ph = jax.lax.dynamic_slice(ph, (0, me * (hwp // P_)), (grid, hwp // P_))
    ch = jnp.fft.ifft(ch * ph, axis=0)
    back = jax.lax.all_to_all(ch, axis, split_axis=0, concat_axis=1,
                              tiled=True)                    # (grid/P, hwp)
    return jnp.fft.irfft(back[:, :hw], n=grid, axis=1)       # (grid/P, grid)


def _fd_force_window(phi_slab, h, *, axis, n_shards, nw, grid):
    """6th-order FD gradient of the distributed φ, gathered on the world
    window (nw+1, nw+1) every chip's interpolation needs.

    The column taps are local (full rows); the ±3 row taps come from ring
    neighbors via ppermute (the ring wrap reproduces the single-chip
    ``jnp.roll`` semantics exactly: row -1 is the padded grid's last row).
    """
    rows_local = grid // n_shards
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    halo_up = jax.lax.ppermute(phi_slab[-3:], axis, fwd)     # rows -3..-1
    halo_dn = jax.lax.ppermute(phi_slab[:3], axis, bwd)      # rows +1..+3
    ext = jnp.concatenate([halo_up, phi_slab, halo_dn])      # (rows+6, grid)

    c1 = 45.0 / (60.0 * h)
    c2 = 9.0 / (60.0 * h)
    c3 = 1.0 / (60.0 * h)
    # columns: local rolls (wrap = padded-grid wrap, same as single-chip)
    m = nw + 1
    core = ext[3:3 + rows_local]
    sh = lambda k: jnp.roll(core, -k, axis=1)[:, :m]
    fx = (c1 * (sh(1) - sh(-1)) - c2 * (sh(2) - sh(-2))
          + c3 * (sh(3) - sh(-3)))
    dy = lambda k: ext[3 + k:3 + k + rows_local, :m]
    fy = (c1 * (dy(1) - dy(-1)) - c2 * (dy(2) - dy(-2))
          + c3 * (dy(3) - dy(-3)))
    # gather world rows 0..nw on every chip
    fx_full = jax.lax.all_gather(fx, axis, tiled=True)       # (grid, m)
    fy_full = jax.lax.all_gather(fy, axis, tiled=True)
    return fx_full[:m], fy_full[:m]


def _pm_accel_local(pos, mass, alive, G, soft2, origin, root_side, *,
                    mesh_level, split_cells, band, chunk, rescue_k,
                    axis, n_shards, kernel=None):
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

    # ---- local CIC deposit (independent planes), distributed FFT solve,
    #      local packed interpolation (same scheme as ops/mesh.py) ----
    base, w = mesh_ops._cic_cells(spos, origin, h, nw, 2)
    rho_local = mesh_ops._deposit_packed(smass, base, w, nw, grid)
    if kernel is None:
        kernel = mesh_ops._kernel_hats(grid, h, soft2, a, dtype)
    phi_slab = _slab_fft_phi(rho_local, kernel[2], axis=axis,
                             n_shards=n_shards, grid=grid)
    fx, fy = _fd_force_window(phi_slab, h, axis=axis, n_shards=n_shards,
                              nw=nw, grid=grid)
    acc_mesh = mesh_ops._interp_packed(fx, fy, base, w, nw)

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
    if rescue_k:
        # Shard-local block rescue (ops/mesh.py::_block_rescue): recovers
        # short-range pairs split by Hilbert discontinuities WITHIN this
        # shard's curve segment. Documented deviation from single-chip:
        # discontinuity pairs spanning two shards are not rescued (the
        # ring halo only covers curve-adjacent slots); their weight decays
        # like the band-miss tail the halo already bounds.
        acc_r, _ = mesh_ops._block_rescue(spos, smass, salive, soft2, a,
                                          band=band, k=rescue_k, chunk=chunk)
        acc_short = acc_short + acc_r

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
            rescue_k=cfg.mesh_rescue, axis=axis, n_shards=n_shards,
            kernel=kernel)

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
