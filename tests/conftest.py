"""Test configuration: force CPU with 8 virtual devices so pjit/shard_map
multi-device paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must run before jax initializes a backend.  The axon sitecustomize
# force-registers the TPU plugin and sets jax_platforms="axon,cpu", so a
# plain env override is not enough — update jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 42
