"""Test configuration: run on 8 virtual CPU devices so sharding/collective
code paths are exercised without TPU hardware (SURVEY.md §4.4)."""

import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel via a
# sitecustomize hook that overrides the env var, so the config update below
# (which wins over the hook) is required in addition to the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the engine-step compiles dominate suite time;
# cache keys include platform + HLO so CPU test artifacts are isolated
# from the TPU cache by directory anyway
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
