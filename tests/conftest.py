"""Test configuration: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths (dp x tp meshes, pjit train steps) run without TPU hardware
(SURVEY §4 test strategy).

Note: this environment registers an experimental 'axon' TPU platform plugin
that overrides JAX_PLATFORMS, so we must force the platform via
jax.config.update *before* the backend initializes."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # the gate's cost is XLA:CPU compiles of full-model fwd+bwd programs on
    # one host core; O0 cuts them ~40% and only affects test-run CPU
    # executables (the TPU bench/driver paths never read this conftest)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (heavyweight AOT/scale)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight scale test, opt-in via --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (opt-in via --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
