"""Multi-chip engine: the full panel API on a ``jax.sharding.Mesh``.

The reference has no distributed backend at all (SURVEY §5.8) — its panel
API (``PhysicsEngine``: reset / add disk / add cloud / add black hole /
step / stats, ``src/main/kotlin/BarnesHutAlg.kt:320-356``) is single
process. :class:`ShardedEngine` keeps that exact surface while the state
lives sharded over a device mesh and every step runs as one
``shard_map``-compiled program (``parallel/sharded.py`` ring all-pairs or
``parallel/sharded_pm.py`` domain-decomposed P3M).

Design:

* Scene edits reuse the single-chip :class:`~tpu_nbody.engine.Engine`
  methods verbatim (they are rare, host-driven events), then re-shard the
  result with :func:`reshard_by_hilbert` so each chip owns a contiguous
  Hilbert segment — the compact spatial domain the sharded P3M's halo
  exchange relies on.
* ``step`` runs in blocks of ``reshard_every`` steps: within a block the
  state stays put and the jitted step runs ``n`` scan iterations; between
  blocks the decomposition is refreshed (bodies drift across domain
  boundaries at a bounded rate, so K is sized so no body can outrun the
  short-range halo between reshards).
* The sharded merge's ``heavy_cap_local`` auto-grows exactly like the
  single-chip engine's caps: on overflow the block is re-run from its
  pre-block state with a doubled cap (no silently dropped absorbers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.engine import Engine, _next_pow2
from tpu_nbody.parallel.mesh import BODY_AXIS, make_mesh
from tpu_nbody.parallel.sharded import make_sharded_step
from tpu_nbody.parallel.sharded_bh import make_sharded_bh_step
from tpu_nbody.parallel.sharded_pm import (make_device_reshard,
                                           make_sharded_pm_step,
                                           reshard_by_hilbert)


class ShardedEngine(Engine):
    """Engine-parity API with bodies sharded over a device mesh.

    solver: ``"pm"`` (domain-decomposed P3M — the scale path), ``"bh"``
    (domain-decomposed trees + locally-essential export,
    :mod:`tpu_nbody.parallel.sharded_bh` — the reference-MAC path), or
    ``"allpairs"`` (exact ppermute-ring — the parity/check path).
    """

    def __init__(self, cfg: SimConfig, params: Params | None = None, *,
                 mesh=None, solver: str = "pm", integrator: str = "kdk",
                 reshard_every: int = 8, heavy_cap_local: int = 16,
                 let_approx_cap: int = 2048, let_body_cap: int = 2048,
                 let_leaf_cap: int = 512, let_frontier_cap: int = 4096,
                 axis: str = BODY_AXIS, seed: int = 3):
        if solver not in ("pm", "bh", "allpairs"):
            raise ValueError(
                f"ShardedEngine supports pm|bh|allpairs, got {solver!r}")
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.reshard_every = int(reshard_every)
        self.heavy_cap_local = int(heavy_cap_local)
        self.let_approx_cap = int(let_approx_cap)
        self.let_body_cap = int(let_body_cap)
        self.let_leaf_cap = int(let_leaf_cap)
        self.let_frontier_cap = int(let_frontier_cap)
        self._steps_since_reshard = 0
        self._sharded = False
        self._device_reshard = None
        # pm solver: cross-shard rescue export cap (auto-grown on overflow)
        self.xrescue_export = int(cfg.mesh_xrescue_export)
        self.last_xport_need = 0
        self.last_ximport_need = 0
        super().__init__(cfg, params, solver=solver, integrator=integrator,
                         seed=seed, auto_retune=False)

    # ------------------------------------------------------------ stepping
    def _build_step(self):
        if self.solver == "pm":
            self._step_fn = make_sharded_pm_step(
                self.mesh, self.cfg, integrator=self.integrator,
                heavy_cap_local=self.heavy_cap_local, axis=self.axis,
                xrescue_export=self.xrescue_export)
        elif self.solver == "bh":
            self._step_fn = make_sharded_bh_step(
                self.mesh, self.cfg, self.caps,
                heavy_cap_local=self.heavy_cap_local,
                let_approx_cap=self.let_approx_cap,
                let_body_cap=self.let_body_cap,
                let_leaf_cap=self.let_leaf_cap,
                let_frontier_cap=self.let_frontier_cap, axis=self.axis)
        else:
            self._step_fn = make_sharded_step(
                self.mesh, integrator=self.integrator,
                heavy_cap_local=self.heavy_cap_local, axis=self.axis)

    def _reshard(self):
        if self._sharded:
            # periodic in-loop reshard: stays on device (odd-even
            # transposition merge-split; no host gather — VERDICT r2 item 7)
            if self._device_reshard is None:
                self._device_reshard = make_device_reshard(
                    self.mesh, self.cfg, axis=self.axis)
            self.state = self._device_reshard(self.state)
        else:
            # fresh / host-edited state: host argsort + scatter once
            self.state = reshard_by_hilbert(self.state, self.mesh, self.cfg,
                                            axis=self.axis)
        self._steps_since_reshard = 0
        self._sharded = True

    def _grow_on_overflow(self, aux) -> bool:
        """Grow caps after an overflowing block; True if anything changed.

        Mirrors the single-chip engine's auto-retune: heavy-cap overflow
        (all solvers), plus local-tree traversal caps and LET export caps
        for the BH solver (dropped export rows mean silently missing
        cross-shard forces).
        """
        import numpy as np

        grewn = False
        slots_local = self.cfg.capacity // self.mesh.shape[self.axis]
        heavy = int(np.asarray(aux.heavy_need if hasattr(aux, "heavy_need")
                               else aux))
        self.last_heavy_need = heavy
        if heavy > self.heavy_cap_local and self.heavy_cap_local < slots_local:
            self.heavy_cap_local = min(slots_local, _next_pow2(2 * heavy))
            grewn = True
        if hasattr(aux, "xport_need"):
            # pm solver: rescue_need/ximport_need are informational (their
            # closest-first ranking drops only the farthest boxes), but a
            # dropped EXPORT hides a block some remote shard explicitly
            # needs — grow the export cap like the heavy cap.
            self.last_rescue_need = int(np.asarray(aux.rescue_need))
            self.last_xport_need = int(np.asarray(aux.xport_need))
            self.last_ximport_need = int(np.asarray(aux.ximport_need))
            self.last_mesh_oob = int(np.asarray(aux.mesh_oob))
            if (self.cfg.mesh_xrescue > 0
                    and self.last_xport_need > self.xrescue_export):
                self.xrescue_export = _next_pow2(2 * self.last_xport_need)
                grewn = True
        if hasattr(aux, "trav"):
            trav = jax.tree.map(np.asarray, aux.trav)
            self.last_stats = trav
            if bool(trav.overflowed(self.caps.as_dict())):
                grown = self.caps.grown(trav)
                if grown != self.caps:
                    self.caps = grown
                    grewn = True
            need = int(np.asarray(aux.export_need))
            cap = self.let_approx_cap + self.let_body_cap
            if need > cap:
                # grow both pools toward 2x the observed need, keeping the
                # approx/body split proportional to their observed parts
                self.let_approx_cap = max(
                    self.let_approx_cap,
                    _next_pow2(2 * int(np.asarray(aux.let_approx_need))))
                self.let_body_cap = max(
                    self.let_body_cap,
                    _next_pow2(2 * max(need
                                       - int(np.asarray(aux.let_approx_need)),
                                       1)))
                grewn = True
            if int(np.asarray(aux.let_leaf_need)) > self.let_leaf_cap:
                self.let_leaf_cap = _next_pow2(
                    2 * int(np.asarray(aux.let_leaf_need)))
                grewn = True
            if int(np.asarray(aux.let_frontier_need)) > self.let_frontier_cap:
                self.let_frontier_cap = _next_pow2(
                    2 * int(np.asarray(aux.let_frontier_need)))
                grewn = True
        return grewn

    def step(self, n: int = 1):
        """Advance ``n`` steps; reshard every ``reshard_every`` steps."""
        if self._step_fn is None:
            self._build_step()
        if not self._sharded:
            self._reshard()
        remaining = int(n)
        while remaining > 0:
            if self._steps_since_reshard >= self.reshard_every:
                self._reshard()
            blk = min(remaining,
                      self.reshard_every - self._steps_since_reshard)
            pre = self.state
            new_state, aux = self._step_fn(self.state, self.params,
                                           n_steps=blk)
            # Overflow means interactions/absorbers were dropped: retune
            # and redo the block from its pre-block state.
            rounds = 0
            while rounds < 6 and self._grow_on_overflow(aux):
                self._build_step()
                new_state, aux = self._step_fn(pre, self.params,
                                               n_steps=blk)
                rounds += 1
            self.state = new_state
            self._steps_since_reshard += blk
            remaining -= blk
        return self.state

    # --------------------------------------------------------- scene edits
    # Engine's host-driven edits produce an unsharded state; re-shard after
    # (host path: the edited state lives on one device anyway).
    def set_bodies(self, pos, vel, mass):
        super().set_bodies(pos, vel, mass)
        self._sharded = False
        self._reshard()

    def add_bodies(self, pos, vel, mass):
        # pull to single-device jax arrays first: concat on sharded arrays
        # would gather anyway, and edits are rare
        self.state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                  self.state)
        super().add_bodies(pos, vel, mass)
        self._sharded = False
        self._reshard()

    def clear(self):
        super().clear()
        self._sharded = False
        self._reshard()
