"""Test configuration: run every test on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host platform
to expose 8 virtual devices (the TPU-native analog of multi-node testing, which the
reference framework lacks entirely — see SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
