"""Test config: CPU backend with 8 virtual devices, float64 for math checks.

The image's sitecustomize registers a remote-TPU ("axon") PJRT plugin at
interpreter startup and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — we flip the platform via jax.config after import. XLA_FLAGS must be
set before the CPU backend is first created (which happens lazily, after
conftest import).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
