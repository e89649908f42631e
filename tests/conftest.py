"""Test env: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
