"""Static configuration and dynamic parameters.

The reference keeps one global *mutable* ``object Config`` (reference:
``src/main/kotlin/Config.kt:2-40``) whose fields are live-mutated by UI key
bindings while the simulation runs, plus a second private const Config for the
GPU demo (``src/main/kotlin/gpu/GPU.kt:15-75``).

TPU-native split:

* :class:`SimConfig` — frozen/static facts that participate in jit tracing
  (capacity, world extent, tree depth, bucket sizes). Changing one of these
  recompiles.
* :class:`Params` — a pytree of dynamic scalars (G, dt, theta, softening^2,
  merge thresholds). These are ordinary traced values: the UI can mutate them
  every step without triggering recompilation, which replicates the
  reference's live-tunable Config vars (``src/main/kotlin/NBodyPanel.kt:247-260``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Reference defaults (src/main/kotlin/Config.kt:5-38).
WIDTH_PX = 2400.0
HEIGHT_PX = 800.0
G_DEFAULT = 80.0
DT_DEFAULT = 0.005
SOFTENING_DEFAULT = 1.0
THETA_DEFAULT = 0.30
DISK_R_DEFAULT = 100.0
DISK_N_DEFAULT = 5_000
CENTRAL_MASS = 50_000.0
MIN_R = 8.0
TOTAL_SATELLITE_MASS = 5_000.0
# Merge rule defaults (src/main/kotlin/BarnesHutAlg.kt:315-321).
MERGE_MAX_MASS_DEFAULT = 4_000.0

# GPU demo defaults (src/main/kotlin/gpu/GPU.kt:15-75) — note they differ
# from the CPU-path Config on purpose; the reference ships two programs.
GPU_WIDTH_PX = 3440.0
GPU_HEIGHT_PX = 1440.0
GPU_CENTRAL_MASS = 5_000.0
GPU_MIN_R = 2.0
GPU_TOTAL_SATELLITE_MASS = 25_000.0


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (compile-time) simulation configuration.

    ``capacity`` is the fixed body-slot count; the live body count is carried
    by the ``alive`` mask in :class:`tpu_nbody.state.SimState`. The reference
    instead resizes a MutableList + accel buffers on every scene change
    (``src/main/kotlin/BarnesHutAlg.kt:342-349``); under XLA we keep shapes
    static and mask.
    """

    capacity: int
    world_w: float = WIDTH_PX
    world_h: float = HEIGHT_PX
    dim: int = 2
    # Adaptive quadtree knobs (BH solver).
    leaf_size: int = 16            # max bodies per leaf before splitting
    max_depth: int = 14            # max tree levels below root (<=16 for 32-bit Morton)
    node_capacity: int = 0         # 0 -> auto (derived from capacity/leaf_size)
    group_size: int = 512          # max bodies per traversal group (tree node);
                                   # larger amortizes traversal over more bodies
                                   # (512 measured ~2x faster than 256 at N=100k)
    group_cap: int = 0             # 0 -> auto: padded group-slot count
    # Traversal list caps (padded static shapes; engine re-derives on overflow).
    approx_cap: int = 4096         # max accepted multipole nodes per group
    leaf_list_cap: int = 512       # max opened leaves per group
    direct_body_cap: int = 4096    # max direct (body-body) partners per group
    frontier_cap: int = 2048       # max BFS frontier nodes per wave per group
    group_chunk: int = 64          # groups evaluated per lax.map chunk (memory bound)
    bh_traversal: str = "auto"     # "dense" = local monotone-MAC classify
                                   # (no BFS — see ops/traverse.py), "bfs" =
                                   # wave traversal (cross-check path),
                                   # "hier" = chunk-hierarchical candidate
                                   # refinement + masked-dense evaluation
                                   # (the large-N fast path), "auto" =
                                   # dense below BH_DENSE_MAX_CAP capacity
                                   # (dense is O(groups x nodes)), hier
                                   # above
    bh_hier_sizes: tuple = (1024, 64, 8)   # hier: groups per chunk at each
                                   # refinement level (descending, each
                                   # divides the previous; levels >= the
                                   # group count are skipped)
    bh_hier_cand_caps: tuple = (131072, 32768, 4096)  # hier: per-chunk
                                   # candidate-list cap per level (engine
                                   # retunes on overflow like the other
                                   # traversal caps; clipped to the node
                                   # table at small N). Defaults = measured
                                   # N=1M two-disk needs with ~1.7x slack
                                   # (72923, 23589, 2534 — hier_probe r4)
    bh_hier_batch: int = 32        # hier: chunks per lax.map batch in the
                                   # partner-flatten stage (memory bound:
                                   # the (batch, leaf_cap, direct_cap)
                                   # membership matmul operand)
    # P3M ("pm") solver knobs.
    mesh_level: int = 11           # world grid = 2^level per side over the root
    mesh_split: float = 4.0        # short/long split radius in cell units
    mesh_band: int = 256           # sorted-order block size for F_short
    mesh_chunk: int = 16384        # bodies per band chunk (memory bound)
    mesh_order: int = 2            # mass assignment: 2 = CIC (default),
                                   # 3 = TSC (9 cells/body, continuous first
                                   # derivative — lower assignment aliasing /
                                   # Lz noise at ~2x deposit+interp cost),
                                   # 1 = NGP (faster, ~20x noisier mesh
                                   # force — see ops/mesh.py)
    mesh_switch: str = "exp4"      # short/long split switch shape:
                                   # "exp4" = exp(-(r/a)^4) (original),
                                   # "poly4" = (1-r^2/(2a)^2)^4 clamped —
                                   # compact support at exactly r=2a and
                                   # ~6x fewer VPU ops/pair on the
                                   # band+rescue hot paths (ops/mesh.py
                                   # _short_weight; accuracy measured
                                   # equal at N=1M, tools/r6_experiments)
    mesh_deconvolve: bool = True   # bake the 1/What^2 assignment-window
                                   # sharpening into the spectral kernel
                                   # (classic P3M; measured 2.4x lower mean
                                   # force error at N=1M — ops/mesh.py
                                   # _assignment_deconv)
    mesh_interlace: bool = False   # average a second half-cell-shifted mesh
                                   # pass: ~2x mesh cost, measured ~1.9x less
                                   # Lz random-walk (PERFORMANCE.md momentum
                                   # notes); combine with mesh_split 8 for
                                   # ~3.4x total
    mesh_ny: int = 0               # rectangular mesh: world-grid ROWS (same
                                   # cell size; columns stay 2^mesh_level over
                                   # the root quad), vertically centered on
                                   # the root center. 0 = square. The
                                   # reference world is 3x wider than tall, so
                                   # ny = nx/2 halves FFT/deposit/interp grid
                                   # work; bodies leaving the window clamp to
                                   # edge rows (counted in the mesh_oob
                                   # stat). Honored by both the single-chip
                                   # and the sharded pm path (round 4; the
                                   # slab FFT requires 2*ny divisible by the
                                   # shard count).
    mesh_rescue: int = 4           # rescue partner blocks per band block
    mesh_rescue_hot: int = 0       # two-tier rescue: total partner blocks
                                   # for HOT blocks (need > mesh_rescue);
                                   # 0 = single-tier (every block gets
                                   # mesh_rescue partners)
    mesh_rescue_hot_cap: int = 128  # max hot blocks per pass (static)
                                   # (0 = off); exact recovery of short-range
                                   # pairs split by Hilbert curve
                                   # discontinuities — see ops/mesh.py
    mesh_xrescue: int = 4          # sharded pm only: cross-shard rescue
                                   # partner blocks per block (0 = off)
    mesh_xrescue_export: int = 64  # sharded pm only: exported boundary
                                   # blocks per shard for the cross-shard
                                   # rescue exchange
    bh_allow_twin_traversal: bool = False  # override the large-capacity
                                   # guard against TWO BH traversal
                                   # instances in one executable (known to
                                   # kernel-fault the TPU worker at N=1M;
                                   # see engine.make_step_fn)
    bh_stream_split: bool = False  # Engine.step_stream (bh + kdk_reuse):
                                   # run each step as FOUR small
                                   # executables (tree build / traversal /
                                   # kick+drift / kick+merge) instead of
                                   # one fused step graph — the fused
                                   # graph at N=1M caps overruns the
                                   # tunnel's remote compile helper, the
                                   # phases compile in minutes
                                   # (engine.make_step_fn phase_fns)
    pm_persistent_sort: bool = True  # pm + kdk_reuse: keep state in Hilbert
                                   # order across scan steps (sort/unsort
                                   # paid once per resort interval, not per
                                   # force pass — engine._make_pm_sorted_step)
    pm_resort_every: int = 8       # steps between re-sorts in that mode
    pm_mesh_every: int = 1         # F_long subcycling: refresh the deposited
                                   # long-range force grids every this many
                                   # steps; between refreshes each step still
                                   # interpolates the (stale) grids at the
                                   # bodies' CURRENT positions while band +
                                   # rescue run fresh. The mesh field evolves
                                   # on the bulk dynamical timescale, so the
                                   # deposit+FFT (the dominant step cost at
                                   # N=1M) amortizes over the interval.
                                   # Honored on the pm + kdk_reuse
                                   # persistent-sort path only; > 1 requires
                                   # pm_heavy_cap > 0 (see ops/mesh.py
                                   # pm_mesh_state for why heavies must not
                                   # ride a stale mesh).
    pm_heavy_cap: int = 0          # exclude the this-many heaviest alive
                                   # bodies from the mesh and sum their
                                   # F_long exactly every step (dense N x cap
                                   # pair math, ~0.2 ms at N=1M, cap=16).
                                   # Mandatory with pm_mesh_every > 1; also a
                                   # pure accuracy upgrade on fresh passes
                                   # (the dominant heavy force component
                                   # becomes exact). 0 = everyone on the mesh.
    pm_self_correct: bool = True   # subtract the analytic stale-grid
                                   # self-term (a body's attraction toward
                                   # its own deposited image) on subcycled
                                   # steps; exact zero at refresh steps
    pm_mesh_extrapolate: bool = False  # pm_mesh_every > 1: carry [T | ΔT]
                                   # tables and extrapolate T + (age/M)·ΔT
                                   # per step. MEASURED WORSE than plain
                                   # stale tables on the two-disk scene
                                   # (N=100k: stale=1 3.0e-3 vs 2.7e-3,
                                   # stale=7 1.25e-2 vs 8.0e-3,
                                   # tools/subcycle_probe.py): the
                                   # staleness error is dominated by
                                   # fast-ORBITING perturbers near the
                                   # cores (periods ~14 steps), which
                                   # linear extrapolation overshoots.
                                   # Kept as a knob for smoother scenes.
    dtype: str = "float32"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @property
    def root_half(self) -> float:
        """Root quad half-side.

        Matches the reference root sizing: half = max(W, H)/2 + 2, centered
        at (W/2, H/2) (``src/main/kotlin/BarnesHutAlg.kt:359-362``).
        """
        return max(self.world_w, self.world_h) / 2.0 + 2.0

    @property
    def root_center(self) -> tuple[float, float]:
        return (self.world_w / 2.0, self.world_h / 2.0)

    @property
    def num_nodes(self) -> int:
        if self.node_capacity:
            return self.node_capacity
        # Each split spawns 4 children; with <=leaf_size bodies per leaf the
        # practical bound is ~6*capacity/leaf_size; keep generous headroom.
        est = 8 * max(self.capacity // self.leaf_size, 1) + 64
        return int(est)

    @property
    def num_groups(self) -> int:
        if self.group_cap:
            return self.group_cap
        return 8 * max(self.capacity // self.group_size, 1) + 64


class Params(NamedTuple):
    """Dynamic (traced) physics parameters — a pytree of scalars.

    Mirrors the reference's live-mutable Config vars + PhysicsEngine merge
    fields: G (``Config.kt:11``), dt (``Config.kt:14``), theta
    (``Config.kt:23``), soft2 = SOFTENING^2 (``Config.kt:17-20``),
    merge_max_mass / merge_min_dist (``BarnesHutAlg.kt:315-321``).
    merge_min_dist <= 0 disables merging (``BarnesHutAlg.kt:465``).
    """

    G: jax.Array
    dt: jax.Array
    theta: jax.Array
    soft2: jax.Array
    merge_max_mass: jax.Array
    merge_min_dist: jax.Array

    @classmethod
    def default(
        cls,
        G: float = G_DEFAULT,
        dt: float = DT_DEFAULT,
        theta: float = THETA_DEFAULT,
        softening: float = SOFTENING_DEFAULT,
        merge_max_mass: float = MERGE_MAX_MASS_DEFAULT,
        merge_min_dist: float = MIN_R,
        dtype=jnp.float32,
    ) -> "Params":
        f = lambda v: jnp.asarray(v, dtype)
        return cls(
            G=f(G),
            dt=f(dt),
            theta=f(theta),
            soft2=f(softening * softening),
            merge_max_mass=f(merge_max_mass),
            merge_min_dist=f(merge_min_dist),
        )

    def replace(self, **kw) -> "Params":
        return self._replace(**{k: jnp.asarray(v, self.G.dtype) for k, v in kw.items()})
