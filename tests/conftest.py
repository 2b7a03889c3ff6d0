"""Test harness configuration.

Parity tests run on CPU with float64 enabled (the reference is float64 numpy);
an 8-device virtual CPU mesh validates multi-chip sharding without TPU pods.
These env vars must be set before jax import, hence this conftest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The deployment's sitecustomize force-registers the axon TPU backend and
# pins JAX_PLATFORMS=axon; in-process config.update is the reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
