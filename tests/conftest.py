"""Test config: force the CPU backend with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session — the
JAX analog of a fake multi-device backend (SURVEY.md §4): sharding/pjit tests
exercise an 8-device mesh without TPU hardware, and compiles stay fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
