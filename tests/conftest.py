"""Test config: force an 8-device virtual CPU mesh before any test runs.

Emulates a TPU v5e-8 slice so sharding/collective tests run anywhere
(SURVEY.md §4). The axon sitecustomize pins jax_platforms to the TPU
backend at interpreter start, so the env var alone is not enough — we must
override the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
