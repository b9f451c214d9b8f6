"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (SURVEY.md §4: multi-device tests
on a single host via xla_force_host_platform_device_count).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon site hook force-sets JAX_PLATFORMS=axon; override via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (release-dims rehearsals); "
        "deselect with -m 'not slow'")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
