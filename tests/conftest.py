"""Test configuration: force CPU with 8 virtual devices so pjit/shard_map
multi-device paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax is imported anywhere in the test process.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 42
