"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md section 4); our test pyramid
replaces its manual end-to-end checks with unit golden tests vs torch-CPU
and multi-device sharding tests on a forced-host-platform CPU mesh.
"""

import os

# Must be set before jax initializes its backends. Force-set (not
# setdefault): the harness presets JAX_PLATFORMS=axon (the TPU tunnel), but
# unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Some pytest plugins import jax before this conftest runs, freezing the
# env-derived default; override through the config API as well (safe until
# the first backend use).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
