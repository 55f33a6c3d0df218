"""Test harness: run all tests on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (the TPU
tunnel), so plain env vars are clobbered; jax.config.update is authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run slow-tier tests (heavyweight parity sweeps, "
             "convergence runs, CLI end-to-ends); without it the default "
             "tier finishes in ~15 min")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tier — skipped by default; run with --slow "
        "(or select explicitly via -m slow)")


def pytest_collection_modifyitems(config, items):
    # an explicit -m expression means the caller is choosing tiers directly
    if config.getoption("--slow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --slow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
