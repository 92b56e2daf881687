"""Test harness config: force CPU backend with 8 virtual devices.

This is the TPU-world substitute for testing multi-chip sharding without a
cluster (SURVEY.md section 4): all `jax.sharding.Mesh` tests run against the
8 virtual CPU devices, and Pallas kernels run in interpret mode.
"""

import os

# Force CPU with 8 virtual devices. jax may already be *imported* (a pytest
# plugin pulls it in before conftest), but no backend is initialized yet, so
# runtime config still takes effect. The session may have JAX_PLATFORMS
# pointing at a real TPU; tests need the CPU mesh and fp32 numerics.
# NB: the jax.config.update("jax_platforms", "cpu") below is LOAD-BEARING,
# not belt-and-braces — this image's sitecustomize pins jax_platforms=axon
# ahead of the JAX_PLATFORMS env var, and initializing the axon backend
# can hang INDEFINITELY when its TPU tunnel is wedged.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite compiles many medium-size graphs;
# caching them on disk makes re-runs dramatically faster
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
