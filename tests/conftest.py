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

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
