"""Test config: force an 8-device virtual CPU mesh before any test runs.

Emulates a TPU v5e-8 slice so sharding/collective tests run anywhere
(SURVEY.md §4). The axon sitecustomize pins jax_platforms to the TPU
backend at interpreter start, so the env var alone is not enough — we must
override the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU collectives have a 40 s rendezvous TERMINATION timeout: if one
# virtual device's thread takes longer than that to reach an
# all-reduce/all-gather, the process is killed ("Exiting to ensure a
# consistent program state") — which is exactly what happens for the
# biggest multi-model graphs on a single-core CI host emulating 8
# devices (round-1's 'Fatal Python error' at test_joint_task). Raise the
# warn/terminate timeouts so slow-but-progressing threads survive.
if "collective_call_terminate_timeout" not in flags:
    flags = (
        flags
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's wall-clock on a 1-core host is
# dominated by XLA CPU compiles; caching them makes re-runs (and CI
# retries) start from warm executables.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("AIG_JAX_CACHE", "/tmp/aig_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
