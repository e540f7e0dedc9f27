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
