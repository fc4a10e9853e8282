"""tpu-nbody: a TPU-native gravitational N-body framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of the Kotlin reference
qwertukg/Barnes-Hut-N-Body (see SURVEY.md): Barnes-Hut approximate forces,
exact all-pairs forces, KDK leapfrog / semi-implicit Euler integration,
mass-threshold merging, Kepler/galaxy/cloud scene generation, interactive
scene editing, on-device point-splat rendering, and multi-chip sharding over
a JAX device mesh.
"""

from tpu_nbody.config import Params, SimConfig
from tpu_nbody.state import SimState, concat_bodies, empty_state, from_arrays

__all__ = [
    "Params",
    "SimConfig",
    "SimState",
    "concat_bodies",
    "empty_state",
    "from_arrays",
]

__version__ = "0.1.0"
