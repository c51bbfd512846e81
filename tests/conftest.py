"""Test harness config: hermetic CPU-JAX with a virtual 8-device mesh.

Tests never require a real TPU; sharding tests run on 8 virtual CPU devices
(mirrors the reference's CPU-only CI, SURVEY §4). Must run before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the
# real-TPU tunnel), so the env var alone is too late — override via config
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
