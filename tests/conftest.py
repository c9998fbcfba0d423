"""Test config: force the CPU backend with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session — the
JAX analog of a fake multi-device backend (SURVEY.md §4): sharding/pjit tests
exercise an 8-device mesh without TPU hardware, and compiles stay fast.
"""

import os

# NOTE: in this environment the JAX_PLATFORMS env var is ignored (the axon
# TPU plugin overrides it); jax.config.update is authoritative.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: 3D-conv compiles dominate test time on CPU.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
