"""Test config: force the CPU backend with 8 virtual devices so mesh and
collective tests run anywhere (the standard JAX trick for testing ICI sharding
without a TPU pod). The axon TPU plugin pins jax_platforms at interpreter
startup, so we must override through jax.config, not the environment."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated on small hosts;
# cached executables make repeat runs (CI, pre-commit) minutes faster.
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update(
    "jax_persistent_cache_enable_xla_caches", "xla_gpu_per_fusion_autotune_cache_dir"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
