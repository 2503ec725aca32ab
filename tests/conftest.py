"""Test configuration: force an 8-device CPU mesh before jax import.

Sharding tests exercise multi-chip paths on virtual CPU devices
(xla_force_host_platform_device_count); kernels run in interpret mode.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Plugins may import jax before this conftest runs, freezing the config
# defaults from the original environment — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
