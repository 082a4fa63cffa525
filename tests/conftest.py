"""Test harness setup.

Tests run on an 8-device virtual CPU mesh (the distributed-without-a-cluster
strategy from SURVEY.md §4): XLA host-platform device multiplication must be
configured before jax initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for late importers
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (the image's sitecustomize registers a TPU
# backend at interpreter start), in which case JAX_PLATFORMS was read at
# import time — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persist compiled executables across test runs (big win on the 1-core host)
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".pytest_cache",
                          "jax_compilation")
os.makedirs(_cache_dir, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
