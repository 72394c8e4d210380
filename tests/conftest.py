"""Test harness: hermetic CPU runs with a virtual 8-device mesh.

Tests run on CPU with ``xla_force_host_platform_device_count=8`` (the
standard JAX idiom for testing shard_map/pjit programs without a TPU slice);
the same sharded code runs unchanged on a real v5e-8. Set LSI_TPU_TEST_TPU=1
to run the suite against the real attached chip instead.

Note: this environment pre-sets JAX_PLATFORMS=axon and a sitecustomize hook
re-forces the axon (TPU-tunnel) platform, so the env var alone is not enough
— we must also win the ``jax_platforms`` config race by updating it here,
before any backend initializes.
"""

import os

if not os.environ.get("LSI_TPU_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
