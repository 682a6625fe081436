"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices (the driver separately
dry-runs the multi-chip path); the real TPU chip is reserved for bench.py.

The container's sitecustomize imports jax and pins JAX_PLATFORMS=axon (the
tunneled TPU) at interpreter start, so env vars are already baked into jax's
config — we must override through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(42)
