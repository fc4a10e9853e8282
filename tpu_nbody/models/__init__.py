from tpu_nbody.models import scenes, scenes3d  # noqa: F401
