"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-device sharding paths are
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path). Must set env BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache for the CPU test mesh: XLA:CPU AOT reload
# compares compiler-tuning pseudo-features (prefer-no-scatter, ...) against
# host CPUID and logs a large error per load; caching only pays on the TPU
# path where steady-state compiles are the latency killer.
os.environ.setdefault("CERES_TPU_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon environment pins JAX_PLATFORMS=axon via sitecustomize; the env var
# alone is not enough — force the config explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream.
    return np.random.default_rng(0)
