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

# Persistent XLA compile cache: the suite's wall clock is dominated by
# CPU compiles of the tiny models (single host core), and the cache works
# on the CPU backend (measured 4.8x on a repeat compile). Cold runs pay
# full price once; every later run (CI, the per-round driver, local
# iteration) hits the cache. U2_TEST_NO_COMPILE_CACHE=1 opts out for
# timing-sensitive investigations.
if os.environ.get("U2_TEST_NO_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Fast-tier policy (r4 VERDICT next #2): the fast tier is an explicit
    ALLOWLIST. Round 4 marked tests slow one by one and the "not slow"
    tier still could not finish inside its own budget — on this
    single-core host any test that jits a model costs seconds, so the
    only tier that stays bounded as tests are added is opt-IN. Every test
    without an explicit ``fast`` marker is treated as slow; mark pure-host
    tests (parsers, metrics, transforms, data plumbing) ``fast`` — budget
    target: `pytest -m "not slow"` completes < 120 s cold.
    """
    for item in items:
        if (item.get_closest_marker("slow") is None
                and item.get_closest_marker("fast") is None):
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
