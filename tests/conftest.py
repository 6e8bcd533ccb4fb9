"""Test env: force CPU with an 8-device virtual mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 implication).  CPU also makes
compiles local + fast — the axon TPU backend compiles remotely, which
dominates test wall-clock and serializes across processes.

NOTE: the axon sitecustomize force-registers the TPU backend and overrides
JAX_PLATFORMS from the environment, so the platform MUST be set via
jax.config after import, before first backend use."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
