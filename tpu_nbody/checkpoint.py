"""Checkpoint / resume.

The reference has none (SURVEY §5.4): state is reconstructable only by
re-running. Here the whole simulation is one pytree, so checkpointing is a
single ``.npz`` round-trip; used by the 10k-step drift benchmark and as
crash recovery for long runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_nbody.config import Params
from tpu_nbody.state import SimState

_PARAM_FIELDS = list(Params._fields)


def save(path, state: SimState, params: Params, **extra):
    np.savez_compressed(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        mass=np.asarray(state.mass),
        alive=np.asarray(state.alive),
        step=np.asarray(state.step),
        params=np.asarray([float(getattr(params, f)) for f in _PARAM_FIELDS]),
        **extra,
    )


def load(path, dtype=jnp.float32):
    with np.load(path) as z:
        state = SimState(
            pos=jnp.asarray(z["pos"], dtype),
            vel=jnp.asarray(z["vel"], dtype),
            mass=jnp.asarray(z["mass"], dtype),
            alive=jnp.asarray(z["alive"], bool),
            step=jnp.asarray(z["step"], jnp.int32),
        )
        pv = z["params"]
        params = Params(**{f: jnp.asarray(pv[i], dtype)
                           for i, f in enumerate(_PARAM_FIELDS)})
        extra = {k: z[k] for k in z.files
                 if k not in {"pos", "vel", "mass", "alive", "step", "params"}}
    return state, params, extra
