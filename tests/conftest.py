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


# --- Test tiering -----------------------------------------------------------
#
# The full suite is ~54 min on this 1-CPU box (measured 54:08, round 3;
# dominated by jit compiles of
# the larger oracle fits). `-m quick` selects a < 5 min subset that still
# touches every test module; `-m slow` is the complement. Membership is
# keyed per test *function* (parametrizations stay together) from measured
# `--durations=0` data — regenerate with tools/tier_tests.py after adding
# expensive tests.
#
#   python -m pytest tests/ -m quick -q    # iteration loop (< 5 min)
#   python -m pytest tests/ -x -q          # full suite (CI cadence)

from pathlib import Path  # noqa: E402

_SLOW_FILE = Path(__file__).with_name("slow_tests.txt")
SLOW_TESTS = frozenset(
    line.strip()
    for line in _SLOW_FILE.read_text().splitlines()
    if line.strip() and not line.startswith("#")
) if _SLOW_FILE.exists() else frozenset()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test (excluded from -m quick)")
    config.addinivalue_line("markers", "quick: fast iteration subset (complement of slow)")


def pytest_collection_modifyitems(config, items):
    markexpr = config.getoption("-m", default="") or ""
    if "quick" in markexpr and not SLOW_TESTS:
        raise pytest.UsageError(
            "-m quick requested but tests/slow_tests.txt is missing/empty, so the "
            "'quick' tier would be the FULL ~54-min suite. Regenerate it: "
            "python -m pytest tests/ -q --durations=0 > /tmp/full_suite.log && "
            "python tools/tier_tests.py /tmp/full_suite.log"
        )
    for item in items:
        name = getattr(item, "originalname", None) or item.name.split("[")[0]
        cls = f"{item.cls.__name__}::" if getattr(item, "cls", None) else ""
        key = f"{Path(str(item.fspath)).name}::{cls}{name}"
        if key in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
