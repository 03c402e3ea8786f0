"""Test env: force an 8-device virtual CPU platform BEFORE jax backends init.

This is the SURVEY.md §4 "distributed-without-a-cluster" harness: every
pjit/shard_map path (DP step, class-sharded ArcFace CE, sharded eval matmul)
runs against a real 8-way Mesh on fake CPU devices, no TPU pod needed.

NOTE: this sandbox's sitecustomize force-registers the 'axon' TPU PJRT plugin
and exports JAX_PLATFORMS=axon in every process, so plain env vars set here
are too late for the platform choice — but jax backends initialize lazily, so
``jax.config.update('jax_platforms', 'cpu')`` before any device use still
wins. XLA_FLAGS is read at (lazy) backend init, so setting it here works.

Set CRFR_TEST_TPU=1 to instead run the suite on the real attached chip(s).
"""

import os

_USE_TPU = bool(os.environ.get("CRFR_TEST_TPU"))

if not _USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Cap the CPU ISA: without this, XLA:CPU AOT cache entries embed
    # machine-detected pseudo-features (prefer-no-scatter/gather) that fail
    # the loader's host check, so the persistent cache NEVER loads and
    # every run recompiles everything (verified: 6 loader errors + full
    # recompile without the flag; clean cache hits with it). AVX2 is plenty
    # for test-sized programs; compile time dominates them anyway.
    if "xla_cpu_max_isa" not in flags:
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the suite re-compiles the same CPU-mesh
    # programs every run (every round); caching them on disk cuts suite
    # wall-time substantially from the second run on.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("CRFR_TEST_CACHE",
                                     "/tmp/crfr_test_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    if not _USE_TPU:
        assert jax.devices()[0].platform == "cpu", jax.devices()
        assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
