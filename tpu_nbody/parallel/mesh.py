"""Device mesh helpers.

The reference is single-process with zero distributed code (SURVEY §5.8);
its only parallelism is a coroutine pool (``BarnesHutAlg.kt:374-395``) and a
GL compute dispatch. The TPU-native scaling axis is a ``jax.sharding.Mesh``:
bodies are sharded over the mesh and forces are reduced with XLA collectives
over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BODY_AXIS = "b"


def make_mesh(n_devices: int | None = None, axis: str = BODY_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_state(state, mesh: Mesh, axis: str = BODY_AXIS):
    """Place a SimState with bodies sharded along the mesh axis."""
    def put(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1)))))
    return jax.tree.map(put, state)
