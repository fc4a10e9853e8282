"""Test env: force CPU backend with 8 virtual devices (fake-mesh trick).

Must run before any jax import (SURVEY §4: substitutes for the reference's
nonexistent distributed tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported at interpreter startup (sitecustomize), in
# which case the env var came too late for platform selection — but the
# backend initializes lazily, so config.update still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="session")
def _check_cpu():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8
