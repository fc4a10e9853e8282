"""High-level simulation engine: the reference ``PhysicsEngine`` + panel API.

Host-side orchestration only — all physics runs on device inside jitted
step functions. Mirrors the reference public surface
(``src/main/kotlin/BarnesHutAlg.kt:287-439``, ``NBodyPanel.kt``):

=====================================  =========================================
reference                              tpu-nbody
=====================================  =========================================
``PhysicsEngine(bodies)``              ``Engine(cfg, solver=..., ...)``
``step()``                             ``engine.step(n=1)`` (n steps, one jit)
``getBodies()``                        ``engine.state`` (SoA pytree)
``resetBodies(list)``                  ``engine.reset(...)`` / ``set_bodies``
``getTreeForDebug()``                  ``engine.tree_boxes()``
``mergeMaxMass`` / ``mergeMinDist``    ``engine.params`` fields
R-key default scene                    ``engine.reset_default_scene()``
LMB drag: add galaxy disk              ``engine.add_galaxy_disk(...)``
RMB drag: add "black hole"             ``engine.add_black_hole(...)``
C key: bodies cloud                    ``engine.add_cloud(...)``
middle click: clear                    ``engine.clear()``
=====================================  =========================================

Solvers: ``"bh"`` (flat-quadtree Barnes-Hut, the default) and ``"allpairs"``
(exact O(N^2), Pallas on TPU — the reference GPU demo's method). Integrators:
``"kdk"`` (literal 2-force-pass leapfrog, reference parity), ``"kdk_reuse"``
(1 force pass/step), ``"euler"`` (GPU-demo parity).

The BH traversal uses static list caps; the engine auto-retunes caps (and
recompiles) when a step reports overflow, the moral equivalent of the
reference growing its accel buffers in ``resetBodies``
(``BarnesHutAlg.kt:342-349``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpu_nbody import state as state_lib
from tpu_nbody.config import Params, SimConfig
from tpu_nbody.models import scenes
from tpu_nbody.ops import (forces, integrate, mesh as mesh_lib, morton,
                           tree as tree_lib, traverse)
from tpu_nbody.ops.merge import merge_bodies
from tpu_nbody.state import SimState


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


@dataclasses.dataclass
class Caps:
    """Runtime-tunable static caps for the BH tree build + traversal lists.

    ``num_nodes`` (the flat node table size) and ``group_size`` (max bodies
    per traversal group) live here rather than only in SimConfig so the
    engine can grow them on overflow: a saturated node table silently
    truncates deep tree levels, and a max-depth leaf bigger than group_size
    would fall outside every traversal group (zero force) — both are
    reported by TraversalStats and retuned exactly like the list caps.
    """
    approx_cap: int
    leaf_list_cap: int
    direct_body_cap: int
    frontier_cap: int
    group_cap: int
    num_nodes: int
    group_size: int
    # hier traversal: per-chunk candidate caps per refinement level
    # (ops/traverse.py _hier_lists); retuned elementwise like the others.
    cand_caps: tuple = (131072, 32768, 4096)

    @classmethod
    def from_config(cls, cfg: SimConfig) -> "Caps":
        return cls(cfg.approx_cap, cfg.leaf_list_cap, cfg.direct_body_cap,
                   cfg.frontier_cap, cfg.num_groups, cfg.num_nodes,
                   cfg.group_size, tuple(cfg.bh_hier_cand_caps))

    def as_dict(self):
        return dataclasses.asdict(self)

    def grown(self, stats: traverse.TraversalStats) -> "Caps":
        """Next caps after an overflow: 2x headroom over observed need."""
        def bump(cap, need):
            need = int(need)
            return max(cap, _next_pow2(2 * need)) if need > cap else cap
        return Caps(
            approx_cap=bump(self.approx_cap, stats.approx_need),
            leaf_list_cap=bump(self.leaf_list_cap, stats.leaf_need),
            direct_body_cap=bump(self.direct_body_cap, stats.direct_need),
            frontier_cap=bump(self.frontier_cap, stats.frontier_need),
            group_cap=bump(self.group_cap, stats.group_need),
            num_nodes=bump(self.num_nodes, stats.node_need),
            # exact bound, no doubling: need = largest leaf population
            group_size=(max(self.group_size,
                            _next_pow2(int(stats.group_size_need)))
                        if int(stats.group_size_need) > self.group_size
                        else self.group_size),
            cand_caps=self._cand_caps_grown(stats),
        )

    def _cand_caps_grown(self, stats) -> tuple:
        if stats.cand_need is None:
            return self.cand_caps
        need = [int(x) for x in stats.cand_need]
        return tuple(
            max(c, _next_pow2(2 * n)) if i < len(need) and (n := need[i]) > c
            else c for i, c in enumerate(self.cand_caps))

    def tightened(self, stats: traverse.TraversalStats) -> "Caps":
        """Caps shrunk toward observed need (~1.5x headroom, pow2).

        Over-generous caps are pure waste on this backend: every traversal
        wave gathers (group_cap x frontier_cap) node rows and every force
        chunk evaluates (group_size x approx/direct cap) pair blocks
        regardless of how much is padding — right-sizing the caps to a
        measured scene cut the N=100k BH force pass 8x (3.2 s -> 0.4 s).
        A cap only shrinks when that wins >= 2x (hysteresis, so a later
        ``grown`` cannot ping-pong); ``group_size`` is a tuning choice, not
        a need bound, and is left alone.
        """
        def shrink(cap, need, floor=64):
            need = int(need)
            if need <= 0:
                return cap
            # 64-multiples, not pow2: pow2 rounding of 1.5x need can land at
            # 2x+ need, giving back a third of the win for nothing.
            tgt = max(floor, -(-int(need * 1.5) // 64) * 64)
            return tgt if 2 * tgt <= cap else cap
        return Caps(
            approx_cap=shrink(self.approx_cap, stats.approx_need),
            leaf_list_cap=shrink(self.leaf_list_cap, stats.leaf_need),
            direct_body_cap=shrink(self.direct_body_cap, stats.direct_need),
            frontier_cap=shrink(self.frontier_cap, stats.frontier_need),
            group_cap=shrink(self.group_cap, stats.group_need),
            num_nodes=shrink(self.num_nodes, stats.node_need, floor=1024),
            group_size=self.group_size,
            cand_caps=(self.cand_caps if stats.cand_need is None else
                       tuple(shrink(c, stats.cand_need[i], floor=256)
                             if i < stats.cand_need.shape[0] else c
                             for i, c in enumerate(self.cand_caps))))


# bh_traversal="auto" switchover: the dense monotone-MAC classification is
# O(groups x nodes) — measured 3x faster than BFS at N=100k but 1.5x slower
# at N=1M (both scale with capacity, so their product is quadratic).
BH_DENSE_MAX_CAP = 1 << 18


def _resolve_traversal(cfg: SimConfig) -> str:
    if cfg.bh_traversal == "auto":
        return "dense" if cfg.capacity <= BH_DENSE_MAX_CAP else "hier"
    return cfg.bh_traversal


def make_bh_accel(cfg: SimConfig, caps: Caps, strict_parity: bool = False):
    """accel(pos, mass, alive, params) -> (acc, stats) via Barnes-Hut."""
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    traversal = _resolve_traversal(cfg)

    def accel(pos, mass, alive, params):
        mass_exert = mass
        if strict_parity:
            # Reference quirk: bodies outside the root quad exert no force
            # (insert no-ops, BarnesHutAlg.kt:126) but still receive forces.
            inside = ((pos[:, 0] >= origin[0]) & (pos[:, 0] < origin[0] + side)
                      & (pos[:, 1] >= origin[1]) & (pos[:, 1] < origin[1] + side))
            mass_exert = jnp.where(inside, mass, 0.0)
        t = tree_lib.build_tree(pos, mass_exert, alive, origin, side,
                                num_nodes=caps.num_nodes,
                                leaf_size=cfg.leaf_size,
                                max_depth=cfg.max_depth)
        return traverse.bh_accel_from_tree(
            t, params.theta, params.soft2, params.G,
            group_size=caps.group_size, group_cap=caps.group_cap,
            max_depth=cfg.max_depth, frontier_cap=caps.frontier_cap,
            approx_cap=caps.approx_cap, leaf_list_cap=caps.leaf_list_cap,
            direct_body_cap=caps.direct_body_cap,
            group_chunk=cfg.group_chunk, traversal=traversal,
            hier_sizes=tuple(cfg.bh_hier_sizes),
            cand_caps=caps.cand_caps, hier_batch=cfg.bh_hier_batch)

    return accel


def make_pm_accel(cfg: SimConfig):
    """accel via the P3M mesh solver (see tpu_nbody.ops.mesh).

    The returned function carries a ``prepare(params)`` attribute that
    precomputes the long-range kernel FFTs; the step builder calls it once
    per jitted step_n (outside the scan) and passes the result back via
    ``kernel=`` so the two padded-grid rfft2s are not redone every force
    pass (they only depend on static config + soft2).
    """
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half

    def prepare(params):
        return mesh_lib.kernel_hats_for(
            side, params.soft2, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
            dtype=cfg.jdtype, order=cfg.mesh_order,
            deconvolve=cfg.mesh_deconvolve, switch=cfg.mesh_switch)

    def accel(pos, mass, alive, params, kernel=None):
        acc, st = mesh_lib.pm_accel(
            pos, mass, alive, params.G, params.soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            band=cfg.mesh_band, chunk=min(cfg.mesh_chunk, cfg.capacity),
            order=cfg.mesh_order, interlace=cfg.mesh_interlace,
            rescue_k=cfg.mesh_rescue,
            rescue_k_hot=cfg.mesh_rescue_hot,
            rescue_hot_cap=cfg.mesh_rescue_hot_cap, mesh_ny=cfg.mesh_ny,
            return_stats=True, kernel=kernel,
            heavy_cap=cfg.pm_heavy_cap, switch=cfg.mesh_switch)
        return acc, st

    accel.prepare = prepare
    return accel


def make_allpairs_accel(implementation: str = "auto"):
    def accel(pos, mass, alive, params):
        mass = jnp.where(alive, mass, 0.0)
        acc = forces.accel_allpairs(pos, mass, params.G, params.soft2,
                                    implementation=implementation)
        return acc, None
    return accel


# Capacity at which two BH traversal instances in one executable are
# refused (worker fault bisected at 2^20; 2x margin). See make_step_fn.
TWIN_TRAVERSAL_MIN_CAP = 1 << 19

_INTEGRATORS = {
    "kdk": integrate.kdk_step,
    "euler": integrate.euler_step,
}


def _split_aux(st):
    """Normalize an accel aux (TraversalStats | pm stats dict | None) into
    the step stats fields (trav, rescue_need, rescue_hot, mesh_oob)."""
    if isinstance(st, dict):
        return (None, st.get("rescue_need", jnp.int32(0)),
                st.get("rescue_hot", jnp.int32(0)),
                st.get("mesh_oob", jnp.int32(0)))
    return st, jnp.int32(0), jnp.int32(0), jnp.int32(0)


def _make_pm_sorted_step(cfg: SimConfig, merge_heavy_cap: int) -> Callable:
    """step_n for solver="pm" + integrator="kdk_reuse" with PERSISTENT
    Hilbert-sorted state (``cfg.pm_persistent_sort``).

    The round-2 per-phase table (PERFORMANCE.md) showed the per-force-pass
    Hilbert argsort (36 ms) + unsort gather (19 ms) at N=1M were paid every
    step even though kdk_reuse runs one force pass per step and the sort
    order barely changes between adjacent steps. Here the scan carries the
    state in sorted order: integrate + merge run in the sorted frame (both
    are order-agnostic up to the merge rule's lowest-index tiebreak, which
    becomes lowest-Hilbert-position — documented deviation from
    ``BarnesHutAlg.kt:463-532`` scan order, reachable only when two heavies
    overlap), the order is refreshed every ``cfg.pm_resort_every`` steps,
    and the original slot order is restored once at the end of the jitted
    call so externally visible slot identity is unchanged.
    """
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    K = max(1, cfg.pm_resort_every)
    chunk = min(cfg.mesh_chunk, cfg.capacity)

    def accel_sorted(pos, mass, alive, params, kernel):
        return mesh_lib.pm_accel_sorted(
            pos, mass, alive, params.G, params.soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            band=cfg.mesh_band, chunk=chunk, order=cfg.mesh_order,
            interlace=cfg.mesh_interlace,
            rescue_k=cfg.mesh_rescue, rescue_k_hot=cfg.mesh_rescue_hot,
            rescue_hot_cap=cfg.mesh_rescue_hot_cap, mesh_ny=cfg.mesh_ny,
            kernel=kernel, switch=cfg.mesh_switch)

    def permute(state, o):
        return state._replace(pos=state.pos[o], vel=state.vel[o],
                              mass=state.mass[o], alive=state.alive[o])

    def sort_order(state):
        codes = morton.hilbert_codes(state.pos, origin, side, state.alive)
        return jnp.argsort(codes, stable=True)

    @jax.jit
    def seed_fn(state: SimState, params: Params):
        kernel = mesh_lib.kernel_hats_for(
            side, params.soft2, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
            dtype=cfg.jdtype, order=cfg.mesh_order,
            deconvolve=cfg.mesh_deconvolve, switch=cfg.mesh_switch)
        perm = sort_order(state)
        state = permute(state, perm)
        acc0, need0 = accel_sorted(state.pos, state.mass, state.alive,
                                   params, kernel)
        return state, perm, acc0, need0, kernel

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def loop_fn(state, perm, acc, need0, kernel, params, n_steps: int):
        def one(carry, i):
            state, acc, perm, heavy_max, resc_max, hot_max, oob_max = carry
            half = params.dt * 0.5
            vel = state.vel + acc * half
            pos = state.pos + vel * params.dt
            a2, (need, hot, oob) = accel_sorted(pos, state.mass, state.alive,
                                                params, kernel)
            vel = vel + a2 * half
            state = state._replace(pos=pos, vel=vel, step=state.step + 1)
            state, heavy = merge_bodies(state, params,
                                        heavy_cap=merge_heavy_cap)

            def resort(st, a, p):
                o = sort_order(st)
                return permute(st, o), a[o], p[o]

            state, a2, perm = jax.lax.cond(
                (i + 1) % K == 0, resort, lambda st, a, p: (st, a, p),
                state, a2, perm)
            return (state, a2, perm, jnp.maximum(heavy_max, heavy),
                    jnp.maximum(resc_max, need),
                    jnp.maximum(hot_max, hot),
                    jnp.maximum(oob_max, oob)), None

        init = (state, acc, perm, jnp.int32(0)) + need0
        (state, acc, perm, heavy, resc, hot, oob), _ = jax.lax.scan(
            one, init, jnp.arange(n_steps))
        state = permute(state, jnp.argsort(perm))
        return state, {"trav": None, "heavy_need": heavy,
                       "rescue_need": resc, "rescue_hot": hot,
                       "mesh_oob": oob}

    def step_n(state: SimState, params: Params, n_steps: int = 1):
        state, perm, acc0, need0, kernel = seed_fn(state, params)
        return loop_fn(state, perm, acc0, need0, kernel, params,
                       n_steps=n_steps)

    step_n.max_stats = _max_stats
    return step_n


def _max_stats(a, b):
    """None-tolerant elementwise max over two step-stats pytrees."""
    if a is None or b is None:
        return a if b is None else b
    return jax.tree.map(jnp.maximum, a, b)


def _make_pm_subcycled_step(cfg: SimConfig, merge_heavy_cap: int) -> Callable:
    """step_n for solver="pm" + kdk_reuse persistent sort with F_LONG
    SUBCYCLING (``cfg.pm_mesh_every`` > 1) and/or HEAVY-DIRECT summation
    (``cfg.pm_heavy_cap`` > 0).

    Extends :func:`_make_pm_sorted_step`'s persistent-sort scan with a
    second carried quantity: the long-range force grids
    (:func:`tpu_nbody.ops.mesh.pm_mesh_state`). The deposit + FFT — the
    dominant P3M step cost at N=1M — runs every ``pm_mesh_every`` steps
    inside a ``lax.cond``; between refreshes each step interpolates the
    stale grids at the bodies' CURRENT positions (the long-range field is
    sourced by the smoothed mass distribution, which evolves on the bulk
    dynamical timescale), subtracts the analytic stale self-term, and adds
    the exact per-step direct force of the ``pm_heavy_cap`` heaviest bodies
    (which are excluded from the mesh — a stale mesh self-image is
    catastrophic at the reference's 50 000 central masses, see
    ``pm_mesh_state``). Band + rescue (the fast-changing short-range
    physics) stay per-step, as does the merge pass.
    """
    M = max(1, cfg.pm_mesh_every)
    H = cfg.pm_heavy_cap
    if M > 1 and H <= 0:
        raise ValueError(
            "pm_mesh_every > 1 requires pm_heavy_cap > 0: heavy bodies "
            "riding a stale mesh feel their own deposited image as a "
            "spurious self-force far exceeding their real acceleration "
            "(ops/mesh.py pm_mesh_state).")
    ox, oy = cfg.root_center
    origin = (ox - cfg.root_half, oy - cfg.root_half)
    side = 2.0 * cfg.root_half
    K = max(1, cfg.pm_resort_every)
    chunk = min(cfg.mesh_chunk, cfg.capacity)

    extrap = cfg.pm_mesh_extrapolate and M > 1

    def mesh_state_fn(spos, smass, salive, params, kernel, prev=None):
        return mesh_lib.pm_mesh_state(
            spos, smass, salive, params.soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            order=cfg.mesh_order, interlace=cfg.mesh_interlace,
            mesh_ny=cfg.mesh_ny, heavy_cap=H,
            deconvolve=cfg.mesh_deconvolve, kernel=kernel, prev=prev,
            switch=cfg.mesh_switch)

    def accel_sorted(spos, smass, salive, params, kernel, ms,
                     stale_frac=None):
        return mesh_lib.pm_accel_sorted(
            spos, smass, salive, params.G, params.soft2, origin, side,
            mesh_level=cfg.mesh_level, split_cells=cfg.mesh_split,
            band=cfg.mesh_band, chunk=chunk, order=cfg.mesh_order,
            interlace=cfg.mesh_interlace,
            rescue_k=cfg.mesh_rescue, rescue_k_hot=cfg.mesh_rescue_hot,
            rescue_hot_cap=cfg.mesh_rescue_hot_cap, mesh_ny=cfg.mesh_ny,
            kernel=kernel, mesh_state=ms, heavy_cap=H,
            self_correct=cfg.pm_self_correct and M > 1,
            stale_frac=stale_frac, switch=cfg.mesh_switch)

    def permute(state, o):
        return state._replace(pos=state.pos[o], vel=state.vel[o],
                              mass=state.mass[o], alive=state.alive[o])

    def permute_ms(ms, o):
        grids, dep_pos, dep_wmass, heavy_mask = ms
        return grids, dep_pos[o], dep_wmass[o], heavy_mask[o]

    def sort_order(state):
        codes = morton.hilbert_codes(state.pos, origin, side, state.alive)
        return jnp.argsort(codes, stable=True)

    @jax.jit
    def seed_fn(state: SimState, params: Params):
        kernel = mesh_lib.kernel_hats_for(
            side, params.soft2, mesh_level=cfg.mesh_level,
            split_cells=cfg.mesh_split, mesh_ny=cfg.mesh_ny,
            dtype=cfg.jdtype, order=cfg.mesh_order,
            deconvolve=cfg.mesh_deconvolve, switch=cfg.mesh_switch)
        perm = sort_order(state)
        state = permute(state, perm)
        ms = mesh_state_fn(state.pos, state.mass, state.alive, params,
                           kernel, prev="zero" if extrap else None)
        acc0, need0 = accel_sorted(state.pos, state.mass, state.alive,
                                   params, kernel, ms)
        return state, perm, ms, acc0, need0, kernel

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def loop_fn(state, perm, ms, acc, need0, kernel, params, n_steps: int):
        def one(carry, i):
            (state, acc, perm, ms, heavy_max, resc_max, hot_max,
             oob_max) = carry
            half = params.dt * 0.5
            vel = state.vel + acc * half
            pos = state.pos + vel * params.dt
            if M > 1:
                ms = jax.lax.cond(
                    i % M == 0,
                    lambda op: mesh_state_fn(
                        op[0], op[1], op[2], params, kernel,
                        prev=ms[0] if extrap else None),
                    lambda op: ms,
                    (pos, state.mass, state.alive))
                frac = (i % M).astype(cfg.jdtype) / M
            else:
                ms = mesh_state_fn(pos, state.mass, state.alive, params,
                                   kernel)
                frac = None
            a2, (need, hot, oob) = accel_sorted(pos, state.mass,
                                                state.alive, params,
                                                kernel, ms,
                                                stale_frac=frac)
            vel = vel + a2 * half
            state = state._replace(pos=pos, vel=vel, step=state.step + 1)
            state, heavy = merge_bodies(state, params,
                                        heavy_cap=merge_heavy_cap)

            def resort(st, a, p, m):
                o = sort_order(st)
                return permute(st, o), a[o], p[o], permute_ms(m, o)

            state, a2, perm, ms = jax.lax.cond(
                (i + 1) % K == 0, resort,
                lambda st, a, p, m: (st, a, p, m),
                state, a2, perm, ms)
            return (state, a2, perm, ms, jnp.maximum(heavy_max, heavy),
                    jnp.maximum(resc_max, need),
                    jnp.maximum(hot_max, hot),
                    jnp.maximum(oob_max, oob)), None

        init = (state, acc, perm, ms, jnp.int32(0)) + need0
        (state, acc, perm, ms, heavy, resc, hot, oob), _ = jax.lax.scan(
            one, init, jnp.arange(n_steps))
        state = permute(state, jnp.argsort(perm))
        return state, {"trav": None, "heavy_need": heavy,
                       "rescue_need": resc, "rescue_hot": hot,
                       "mesh_oob": oob}

    def step_n(state: SimState, params: Params, n_steps: int = 1):
        state, perm, ms, acc0, need0, kernel = seed_fn(state, params)
        return loop_fn(state, perm, ms, acc0, need0, kernel, params,
                       n_steps=n_steps)

    step_n.max_stats = _max_stats
    return step_n


def make_step_fn(cfg: SimConfig, caps: Caps, solver: str, integrator: str,
                 strict_parity: bool, merge_heavy_cap: int,
                 allpairs_impl: str = "auto") -> Callable:
    """Build step_n(state, params, n_steps static) -> (state, stats).

    ``stats`` is a dict ``{"trav": TraversalStats | None, "heavy_need": i32}``
    max-reduced over the executed steps; the engine uses it to retune the
    traversal caps and the merge heavy cap on overflow.
    """
    if solver == "pm" and integrator == "kdk_reuse" and cfg.pm_persistent_sort:
        if max(1, cfg.pm_mesh_every) > 1 or cfg.pm_heavy_cap > 0:
            return _make_pm_subcycled_step(cfg, merge_heavy_cap)
        return _make_pm_sorted_step(cfg, merge_heavy_cap)
    if solver == "pm" and max(1, cfg.pm_mesh_every) > 1:
        raise ValueError(
            "pm_mesh_every > 1 (F_long subcycling) is only supported on "
            "the pm + kdk_reuse persistent-sort path (the carried grids "
            "live in its scan); use integrator='kdk_reuse' with "
            "pm_persistent_sort=True.")
    if (solver == "bh" and integrator == "kdk"
            and cfg.capacity >= TWIN_TRAVERSAL_MIN_CAP
            and not cfg.bh_allow_twin_traversal):
        # Two BH traversal instances in ONE XLA executable kernel-fault this
        # backend's TPU worker at large N (bisected at N=1M,
        # tools/bh_fault_bisect.py; the standalone pass and any
        # single-instance graph run fine). The literal 2-pass kdk embeds
        # both of a step's traversals in one program, so it is refused at
        # capacity >= 2^19 (2x margin below the bisected 2^20 fault point)
        # rather than left to crash mid-run. kdk_reuse is
        # trajectory-identical with merging off and runs one instance per
        # executable; set cfg.bh_allow_twin_traversal=True to bypass (e.g.
        # on a non-tunnel backend).
        raise RuntimeError(
            f"solver='bh' with integrator='kdk' at capacity "
            f"{cfg.capacity} >= {TWIN_TRAVERSAL_MIN_CAP} builds two "
            f"traversal instances in one executable, which kernel-faults "
            f"this TPU backend (PERFORMANCE.md). Use integrator="
            f"'kdk_reuse', or set SimConfig.bh_allow_twin_traversal=True "
            f"to override.")
    if solver == "bh":
        accel_stats = make_bh_accel(cfg, caps, strict_parity)
    elif solver == "allpairs":
        accel_stats = make_allpairs_accel(allpairs_impl)
    elif solver == "pm":
        accel_stats = make_pm_accel(cfg)
    else:
        raise ValueError(f"unknown solver {solver!r}")

    # Reference quirk behind strict_parity: the recursive insert NUDGES
    # near-coincident bodies by +-1e-3 during the tree build, mutating
    # simulation state (BarnesHutAlg.kt:139-151). Applied here once per
    # step before the force pass (= the step's first tree build; the
    # literal 2-pass kdk's second build re-nudging within one step is not
    # reproduced — the first nudge separates the pair beyond the trigger
    # cell, making the second a no-op except for pathological stacks).
    pre_step = None
    if solver == "bh" and strict_parity:
        ox, oy = cfg.root_center
        p_origin = (ox - cfg.root_half, oy - cfg.root_half)
        p_side = 2.0 * cfg.root_half

        def pre_step(state):
            return state._replace(pos=tree_lib.strict_parity_nudge(
                state.pos, state.alive, p_origin, p_side))

    stats_holder = []
    prepare = getattr(accel_stats, "prepare", None)
    # Set per step_n trace (before any accel call); inside the scan the
    # prepared value is a loop constant, so e.g. the P3M kernel FFTs are
    # computed once per step_n call instead of per force pass.
    aux_cell = [None]

    def accel(pos, mass, alive, params):
        if prepare is None:
            acc, st = accel_stats(pos, mass, alive, params)
        else:
            acc, st = accel_stats(pos, mass, alive, params,
                                  kernel=aux_cell[0])
        stats_holder.append(st)
        return acc

    max_stats = _max_stats

    if integrator in _INTEGRATORS:
        int_step = _INTEGRATORS[integrator]

        def one_step(state, params):
            del stats_holder[:]
            if pre_step is not None:
                state = pre_step(state)
            state = int_step(state, params, accel)
            trav, resc, hot, oob = _split_aux(
                functools.reduce(max_stats, stats_holder, None))
            state, heavy = merge_bodies(state, params,
                                        heavy_cap=merge_heavy_cap)
            return state, {"trav": trav, "heavy_need": heavy,
                           "rescue_need": resc, "rescue_hot": hot,
                           "mesh_oob": oob}

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def step_n(state: SimState, params: Params, n_steps: int = 1):
            aux_cell[0] = prepare(params) if prepare is not None else None

            def body(carry, _):
                st, acc_stats = carry
                st, s = one_step(st, params)
                return (st, max_stats(acc_stats, s)), None

            # Trace once outside scan to get the stats structure.
            state0, st0 = one_step(state, params)
            if n_steps == 1:
                return state0, st0
            (state, stf), _ = jax.lax.scan(
                body, (state0, st0), None, length=n_steps - 1)
            return state, stf

    elif integrator == "kdk_reuse":

        def one_step(state, acc, params):
            del stats_holder[:]
            if pre_step is not None:
                # carried acc is for the un-nudged positions; the nudge only
                # moves coincident bodies by 1e-3 so the mismatch is O(eps)
                state = pre_step(state)
            state, acc = integrate.kdk_reuse_step(state, acc, params, accel)
            trav, resc, hot, oob = _split_aux(
                functools.reduce(max_stats, stats_holder, None))
            state, heavy = merge_bodies(state, params,
                                        heavy_cap=merge_heavy_cap)
            return state, acc, {"trav": trav, "heavy_need": heavy,
                                "rescue_need": resc, "rescue_hot": hot,
                                "mesh_oob": oob}

        # The seed force pass runs in its OWN executable: at large N two
        # traversal instances in one XLA program crash this backend's TPU
        # worker (bisected at N=1M: the standalone pass and the
        # single-instance euler step run fine, the two-instance kdk graph
        # kernel-faults the worker), and the scan body below already embeds
        # one instance. Splitting costs one extra dispatch + re-running
        # prepare() per step_n call — noise at the scales where it matters.
        @jax.jit
        def seed_fn(state: SimState, params: Params):
            aux = prepare(params) if prepare is not None else None
            aux_cell[0] = aux
            del stats_holder[:]
            acc0 = accel(state.pos, state.mass, state.alive, params)
            trav, resc, hot, oob = _split_aux(
                functools.reduce(max_stats, stats_holder, None))
            seed_st = {"trav": trav, "heavy_need": jnp.int32(0),
                       "rescue_need": resc, "rescue_hot": hot,
                       "mesh_oob": oob}
            return acc0, seed_st, aux

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def loop_fn(state, acc0, seed_st, aux, params, n_steps: int):
            aux_cell[0] = aux
            # EXACTLY ONE traversal instance in this executable: all steps
            # run through the single scan body (the seed pass already
            # provides the carried stats structure). Unrolling the first
            # step next to the scan embeds a SECOND instance, which
            # kernel-faults this backend's worker at capacity >= 2^20
            # (the twin-traversal fault, PERFORMANCE.md) — bench.py's
            # N=1M bh run died exactly there in round 4.
            if n_steps == 1:
                state, acc, st = one_step(state, acc0, params)
                return state, max_stats(seed_st, st)

            def body(carry, _):
                s, a, acc_stats = carry
                s, a, ss = one_step(s, a, params)
                return (s, a, max_stats(acc_stats, ss)), None
            (state, acc, st), _ = jax.lax.scan(
                body, (state, acc0, seed_st), None, length=n_steps)
            return state, st

        @jax.jit
        def carry_fn(state, acc, aux, params):
            # one step as its OWN executable (one traversal instance, no
            # scan), with the reused-kick acceleration carried in/out so a
            # python-side loop pays 1 force pass/step like the scan does.
            # Exists because a lax.scan over the BH hier traversal at
            # N=1M crashes this backend's TPU worker even with a single
            # instance in the body (the scan fault, PERFORMANCE.md round
            # 4) — Engine.step_stream drives this instead.
            aux_cell[0] = aux
            state, acc, st = one_step(state, acc, params)
            return state, acc, st

        def step_n(state: SimState, params: Params, n_steps: int = 1):
            acc0, seed_st, aux = seed_fn(state, params)
            return loop_fn(state, acc0, seed_st, aux, params,
                           n_steps=n_steps)

        step_n.seed_fn = seed_fn
        step_n.carry_fn = carry_fn

        if solver == "bh":
            # Phase-split stream executables: at N=1M hier caps the FUSED
            # one-step graph (tree build + traversal + integrate + merge)
            # can overrun the tunnel's remote compile helper (HTTP 500
            # after ~56 min), while the same phases compile in minutes as
            # separate executables (tools/hier_probe.py builds and
            # traverses in their own jits). ``Engine.step_stream`` drives
            # these when ``cfg.bh_stream_split`` is set: 4 dispatches per
            # step (~1 ms each) against a ~0.5 s N=1M step, identical op
            # order to the fused kdk_reuse one_step.
            ox, oy = cfg.root_center
            b_origin = (ox - cfg.root_half, oy - cfg.root_half)
            b_side = 2.0 * cfg.root_half
            b_traversal = _resolve_traversal(cfg)

            @jax.jit
            def build_fn(pos, mass, alive):
                mass_exert = mass
                if strict_parity:
                    inside = ((pos[:, 0] >= b_origin[0])
                              & (pos[:, 0] < b_origin[0] + b_side)
                              & (pos[:, 1] >= b_origin[1])
                              & (pos[:, 1] < b_origin[1] + b_side))
                    mass_exert = jnp.where(inside, mass, 0.0)
                return tree_lib.build_tree(pos, mass_exert, alive, b_origin,
                                           b_side, num_nodes=caps.num_nodes,
                                           leaf_size=cfg.leaf_size,
                                           max_depth=cfg.max_depth)

            @jax.jit
            def trav_fn(t, params):
                return traverse.bh_accel_from_tree(
                    t, params.theta, params.soft2, params.G,
                    group_size=caps.group_size, group_cap=caps.group_cap,
                    max_depth=cfg.max_depth, frontier_cap=caps.frontier_cap,
                    approx_cap=caps.approx_cap,
                    leaf_list_cap=caps.leaf_list_cap,
                    direct_body_cap=caps.direct_body_cap,
                    group_chunk=cfg.group_chunk, traversal=b_traversal,
                    hier_sizes=tuple(cfg.bh_hier_sizes),
                    cand_caps=caps.cand_caps, hier_batch=cfg.bh_hier_batch)

            @jax.jit
            def pre_fn(state, acc, params):
                pos = state.pos
                if pre_step is not None:
                    pos = tree_lib.strict_parity_nudge(
                        pos, state.alive, b_origin, b_side)
                half = params.dt * 0.5
                vel_half = state.vel + acc * half
                return pos + vel_half * params.dt, vel_half

            @jax.jit
            def post_fn(state, pos_new, vel_half, acc2, params):
                half = params.dt * 0.5
                st = state._replace(pos=pos_new,
                                    vel=vel_half + acc2 * half,
                                    step=state.step + 1)
                return merge_bodies(st, params, heavy_cap=merge_heavy_cap)

            step_n.phase_fns = (build_fn, trav_fn, pre_fn, post_fn)

    else:
        raise ValueError(f"unknown integrator {integrator!r}")

    step_n.max_stats = max_stats
    return step_n


class Engine:
    """Interactive-grade engine with the reference's full scene API."""

    def __init__(self, cfg: SimConfig, params: Params | None = None, *,
                 solver: str = "bh", integrator: str = "kdk",
                 strict_parity: bool = False, merge_heavy_cap: int = 64,
                 allpairs_impl: str = "auto", seed: int = 3,
                 auto_retune: bool = True):
        self.cfg = cfg
        self.params = params or Params.default()
        self.solver = solver
        self.integrator = integrator
        self.strict_parity = strict_parity
        self.merge_heavy_cap = merge_heavy_cap
        self.allpairs_impl = allpairs_impl
        self.auto_retune = auto_retune
        self.caps = Caps.from_config(cfg)
        self.key = jax.random.PRNGKey(seed)
        self.state = state_lib.empty_state(cfg.capacity, cfg.dim, cfg.jdtype)
        self.last_stats: traverse.TraversalStats | None = None
        self.last_heavy_need: int = 0
        # Max rescue partner blocks any band block wanted in the last step
        # (pm solver). Informational: with closest-first partner ranking,
        # need > cfg.mesh_rescue means the FARTHEST candidate boxes (whose
        # pair weights are smallest) were dropped — measured at N=1M the
        # dense core wants up to 97 partners while k=12 already matches the
        # k=24 accuracy (PERFORMANCE.md), so the engine deliberately does
        # NOT auto-grow this cap.
        self.last_rescue_need: int = 0
        # Hot blocks (need > mesh_rescue) seen by the two-tier rescue; must
        # stay <= cfg.mesh_rescue_hot_cap for top-k_hot coverage.
        self.last_rescue_hot: int = 0
        # Alive bodies outside the rectangular mesh window (cfg.mesh_ny):
        # they clamp to the edge rows; nonzero means the window is
        # mis-sized for the scene.
        self.last_mesh_oob: int = 0
        self._step_fn = None

    # ------------------------------------------------------------ stepping
    def _build_step(self):
        self._step_fn = make_step_fn(
            self.cfg, self.caps, self.solver, self.integrator,
            self.strict_parity, self.merge_heavy_cap, self.allpairs_impl)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _record_stats(self, stats):
        stats = jax.tree.map(np.asarray, stats)
        self.last_stats = stats["trav"]
        self.last_heavy_need = int(stats["heavy_need"])
        self.last_rescue_need = int(stats.get("rescue_need", 0))
        self.last_rescue_hot = int(stats.get("rescue_hot", 0))
        self.last_mesh_oob = int(stats.get("mesh_oob", 0))
        return stats

    def _overflowed(self, stats) -> bool:
        if int(stats["heavy_need"]) > self.merge_heavy_cap:
            return True
        trav = stats["trav"]
        return trav is not None and bool(trav.overflowed(self.caps.as_dict()))

    def _run_with_retune(self, run: Callable):
        """Run ``run() -> (state, recorded_stats)``; on overflow, grow caps,
        rebuild the step fn, and redo from the pre-run state (up to 6
        rounds). Overflow means interactions (or merge absorbers) were
        dropped; iteration matters because a truncated frontier hides
        deeper-level needs, so one growth round may reveal more."""
        new_state, stats = run()
        rounds = 0
        while (self.auto_retune and rounds < 6 and self._overflowed(stats)):
            progressed = False
            if stats["trav"] is not None:
                grown = self.caps.grown(stats["trav"])
                if grown != self.caps:
                    self.caps = grown
                    progressed = True
            heavy = int(stats["heavy_need"])
            if heavy > self.merge_heavy_cap:
                self.merge_heavy_cap = min(self.cfg.capacity,
                                           _next_pow2(2 * heavy))
                progressed = True
            if not progressed:
                break
            self._build_step()
            new_state, stats = run()
            rounds += 1
        self.state = new_state
        return self.state

    def step(self, n: int = 1):
        """Advance ``n`` steps (one jit call). Auto-retunes caps on overflow."""
        if self._step_fn is None:
            self._build_step()

        def run():
            state, stats = self._step_fn(self.state, self.params, n_steps=n)
            return state, self._record_stats(stats)

        return self._run_with_retune(run)

    def step_stream(self, n: int = 1):
        """Advance ``n`` steps as ``n`` single-step executables (no scan).

        ``kdk_reuse`` only (other integrators fall through to ``step``):
        seeds the carried acceleration once, then repeats one jitted
        single-traversal-instance step per call, python-side. This is the
        large-N BH stepping mode on this backend — a ``lax.scan`` whose
        body holds the hier traversal kernel-faults the TPU worker at
        N=1M even with one instance per executable (the scan fault,
        PERFORMANCE.md round 4), while the identical step graph as its
        own executable runs fine. Costs one extra dispatch per step
        (~5 ms against a ~0.5 s step). Auto-retunes caps on overflow and
        redoes the stream from the pre-stream state, like ``step``.
        """
        if self.integrator != "kdk_reuse":
            return self.step(n)
        if self._step_fn is None:
            self._build_step()
        if not hasattr(self._step_fn, "seed_fn"):
            # pm persistent-sort step (``_make_pm_sorted_step``) has no
            # seed/carry split — its scan body holds no BH traversal so the
            # scan fault this method exists to dodge cannot hit it.
            return self.step(n)

        fns = getattr(self._step_fn, "phase_fns", None)
        if fns is not None and self.cfg.bh_stream_split:
            # Split executables (build / traverse / pre / post) — see the
            # phase_fns comment in make_step_fn for why.
            build_fn, trav_fn, pre_fn, post_fn = fns
            zero = jnp.int32(0)

            def pack(tstats, heavy):
                return {"trav": tstats, "heavy_need": heavy,
                        "rescue_need": zero, "rescue_hot": zero,
                        "mesh_oob": zero}

            def run_phases():
                state = self.state
                t = build_fn(state.pos, state.mass, state.alive)
                acc, tstats = trav_fn(t, self.params)
                agg = pack(tstats, zero)
                for _ in range(n):
                    pos2, vhalf = pre_fn(state, acc, self.params)
                    t = build_fn(pos2, state.mass, state.alive)
                    acc, tstats = trav_fn(t, self.params)
                    state, heavy = post_fn(state, pos2, vhalf, acc,
                                           self.params)
                    agg = self._step_fn.max_stats(agg, pack(tstats, heavy))
                return state, self._record_stats(agg)

            return self._run_with_retune(run_phases)

        def run_stream():
            state = self.state
            acc, agg, aux = self._step_fn.seed_fn(state, self.params)
            for _ in range(n):
                state, acc, st = self._step_fn.carry_fn(
                    state, acc, aux, self.params)
                agg = self._step_fn.max_stats(agg, st)
            return state, self._record_stats(agg)

        return self._run_with_retune(run_stream)

    def tighten_caps(self) -> bool:
        """Shrink BH caps to ~1.5x the needs the last ``step`` observed.

        Call after a warmup step on a representative scene; the next
        ``step`` recompiles with the smaller static shapes (see
        ``Caps.tightened`` for why this is a large win). Returns True if
        the caps changed. The overflow auto-retune still grows them back
        if the scene later needs more.
        """
        if self.last_stats is None:
            return False
        t = self.caps.tightened(self.last_stats)
        if t != self.caps:
            self.caps = t
            self._build_step()
            return True
        return False

    def get_bodies(self):
        """Alive bodies as host numpy (pos, vel, mass) — the
        ``PhysicsEngine.getBodies()`` equivalent (``BarnesHutAlg.kt:335``).
        For device-side work use ``engine.state`` directly."""
        alive = np.asarray(self.state.alive)
        return (np.asarray(self.state.pos)[alive],
                np.asarray(self.state.vel)[alive],
                np.asarray(self.state.mass)[alive])

    # --------------------------------------------------------- scene edits
    def set_bodies(self, pos, vel, mass):
        self.state = state_lib.from_arrays(pos, vel, mass, self.cfg.capacity)

    def add_bodies(self, pos, vel, mass):
        self.state = state_lib.concat_bodies(self.state, pos, vel, mass)

    def clear(self):
        self.state = state_lib.clear(self.state)

    def reset_default_scene(self, n1: int = 10_000, n2: int = 2_500):
        p, v, m = scenes.default_two_disk_scene(
            self._next_key(), n1=n1, n2=n2, world_w=self.cfg.world_w,
            world_h=self.cfg.world_h, G=float(self.params.G),
            dtype=self.cfg.jdtype)
        self.set_bodies(p, v, m)

    def add_galaxy_disk(self, x, y, r=None, n=None, vx=0.0, vy=0.0, **kw):
        """LMB drag equivalent (``NBodyPanel.kt:170,228-234``)."""
        r = 100.0 if r is None else float(r)
        n = 5_000 if n is None else n
        p, v, m = scenes.make_galaxy_disk(
            self._next_key(), n, x=x, y=y, r=r, vx=vx, vy=vy,
            G=float(self.params.G), world_w=self.cfg.world_w,
            world_h=self.cfg.world_h, dtype=self.cfg.jdtype, **kw)
        self.add_bodies(p, v, m)

    def add_kepler_disk(self, x, y, r=None, n=5_000, vx=0.0, vy=0.0, **kw):
        p, v, m = scenes.make_kepler_disk(
            self._next_key(), n, x=x, y=y, r=r, vx=vx, vy=vy,
            G=float(self.params.G), world_w=self.cfg.world_w,
            world_h=self.cfg.world_h, dtype=self.cfg.jdtype, **kw)
        self.add_bodies(p, v, m)

    def add_black_hole(self, x, y, vx=0.0, vy=0.0, mass=None):
        """RMB drag: a galaxy "disk" with zero satellites — one body of
        CENTRAL_MASS (``NBodyPanel.kt:171``), which feeds the merge rule."""
        from tpu_nbody.config import CENTRAL_MASS
        m = CENTRAL_MASS if mass is None else mass
        self.add_bodies(jnp.asarray([[x, y]], self.cfg.jdtype),
                        jnp.asarray([[vx, vy]], self.cfg.jdtype),
                        jnp.asarray([m], self.cfg.jdtype))

    def add_cloud(self, n: int = 5_000, m: float = 0.5):
        """C key (``NBodyPanel.kt:282-286``)."""
        p, v, mm = scenes.make_uniform_cloud(
            self._next_key(), n, m, world_w=self.cfg.world_w,
            world_h=self.cfg.world_h, dtype=self.cfg.jdtype)
        self.add_bodies(p, v, mm)

    def compact(self):
        """Pack alive bodies to the front (after heavy merging)."""
        self.state = state_lib.compact(self.state)

    # -------------------------------------------------------------- debug
    def tree_boxes(self):
        """Quad outlines for the D-key debug overlay (numpy arrays)."""
        ox, oy = self.cfg.root_center
        origin = (ox - self.cfg.root_half, oy - self.cfg.root_half)
        t = tree_lib.build_tree(
            self.state.pos, jnp.where(self.state.alive, self.state.mass, 0.0),
            self.state.alive, origin, 2.0 * self.cfg.root_half,
            num_nodes=self.caps.num_nodes, leaf_size=self.cfg.leaf_size,
            max_depth=self.cfg.max_depth)
        center, side, valid = tree_lib.debug_boxes(t)
        v = np.asarray(valid)
        return np.asarray(center)[v], np.asarray(side)[v]

    def stats(self, potential: bool | None = None):
        """Device-computed HUD scalars. ``potential`` (O(N^2)) defaults on
        up to 64k capacity, off above — pass explicitly to override."""
        from tpu_nbody.ops import diagnostics
        if potential is None:
            potential = self.cfg.capacity <= 65536
        return jax.tree.map(np.asarray, diagnostics.stats(
            self.state, self.params, potential=potential))
