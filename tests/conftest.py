"""Test configuration: run every test on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
to expose 8 virtual devices (the TPU-native analog of multi-node testing, which the
reference framework lacks entirely — see SURVEY.md §4).

NOTE: this environment pre-imports jax via a sitecustomize (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon (the real TPU tunnel), so env vars alone
are ignored; we must force the platform through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: DISABLED by default for the CPU suite. XLA:CPU
# AOT executable deserialization is unreliable on this host family — the
# cpu_aot_loader logs machine-feature mismatches (+prefer-no-scatter etc.) on
# every load and intermittently SEGFAULTs inside
# compilation_cache.get_executable_and_time when a cached executable is
# reloaded mid-trace (reproduced: full tests/test_spunet.py run, round 3).
# Opt back in with PONDER_JAX_CACHE=/path for debugging.
if os.environ.get("PONDER_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["PONDER_JAX_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "expected 8 simulated CPU devices"
    return devs
