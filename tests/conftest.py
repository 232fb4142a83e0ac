"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU; multi-device sharding is exercised on
XLA's host platform (SURVEY.md §4: the TPU-native analogue of the missing
upstream test suite).
"""

import os

# Must run before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax to the TPU plugin regardless of env vars;
# override via jax.config so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
