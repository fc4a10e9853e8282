from tpu_nbody.ops import (  # noqa: F401
    diagnostics,
    forces,
    integrate,
    merge,
    morton,
    traverse,
    tree,
)
