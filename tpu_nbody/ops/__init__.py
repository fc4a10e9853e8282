from tpu_nbody.ops import (  # noqa: F401
    diagnostics,
    forces,
    integrate,
    merge,
    mesh,
    morton,
    render,
    traverse,
    tree,
)
