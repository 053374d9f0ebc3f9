"""Test configuration: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths (dp x tp meshes, pjit train steps) run without TPU hardware
(SURVEY §4 test strategy). Must run before jax is imported anywhere."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax
    return jax.random.PRNGKey(0)
