"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by running JAX on the host
platform with 8 virtual devices (the reference has no analog — its parallelism is a
multiprocessing pool, safepy/safe.py:510-514). Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin (tunneled single chip) registers itself from sitecustomize at
# interpreter startup — before this conftest runs — so jax is typically already
# imported and env vars alone are too late. jax.config.update still wins as long as
# no backend has been initialized yet.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
# No persistent compilation cache under tests: CPU AOT entries reload with
# XLA feature-list mismatch warnings (and the cache exists for the REMOTE
# TPU compile path, which tests never touch).
os.environ.setdefault("SAFEPY_TPU_COMPILE_CACHE", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


# --------------------------------------------------------------------- slow lane
# The heavy equivalence suites (multi-engine bit-identity at n=500-600 over
# the 8-device mesh) dominate the wall clock. The default run skips tests
# MARKED slow so the iteration loop stays ~3 min; the FULL lane —
# `python -m pytest tests/ -q --runslow` — runs everything and must stay
# green (no assertion lives only in a skipped test's shadow: every engine
# keeps at least one fast-lane equivalence pin).

def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (the full lane)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy equivalence/scale test; skipped unless "
                   "--runslow (full lane)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
