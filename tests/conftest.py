"""Test configuration: force an 8-device CPU mesh before JAX initializes.

Multi-chip sharding tests run the same pjit programs on a fake 8-device CPU
mesh (SURVEY §4's test strategy); TPU benchmarking happens in bench.py, not
here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize force-registers a TPU backend and
# overrides JAX_PLATFORMS; re-force CPU before any backend initializes
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite compiles several large programs
# and this host has one core — cache them across runs
try:
    from weclip_tpu.core.runtime import enable_compilation_cache
    enable_compilation_cache(os.path.expanduser("~/.cache/weclip_test_xla"))
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
