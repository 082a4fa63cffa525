"""Test harness setup.

Tests run on an 8-device virtual CPU mesh (the distributed-without-a-cluster
strategy from SURVEY.md §4): XLA host-platform device multiplication must be
configured before jax initializes, hence the env mutation at import time.
"""

import os
import sys

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

# persist compiled executables across test runs (big win on the 1-core
# host); one cache-knob implementation lives in cli.common
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ganleaks_tpu.cli.common import (  # noqa: E402
    enable_persistent_compilation_cache, harden_cache_writes)

enable_persistent_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".pytest_cache",
                 "jax_compilation"))
# jaxlib 0.9.0's cache-write path segfaulted the full suite at ~325/373
# (state-dependent, frames inside executable.serialize()+zstd) — writes
# run fork-isolated so a crash costs one cache entry, not the run
harden_cache_writes()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


def _map_count() -> int:
    try:
        with open("/proc/self/maps") as m:
            return sum(1 for _ in m)
    except OSError:
        return 0


# Root cause of the historical full-suite SIGSEGV at ~325/373 (always at
# the next BIG XLA compile, test_privgan.py:52; same test green in
# isolation): the process accumulates memory mappings — one per compiled
# executable's code pages plus allocator arenas — at ~150/test, crossing
# ~55k by the privgan file. vm.max_map_count is 65530, and the huge
# vmapped-stack compile spikes thousands of transient mappings: mmap
# starts failing mid-compile and XLA:CPU segfaults instead of erroring.
# Mitigation: when map pressure nears the cliff, drop jax's in-process
# executable caches (the persistent disk cache makes recompiles cheap).
_MAP_PRESSURE_LIMIT = 45_000


@pytest.fixture(autouse=True)
def _mapcount_log(request):
    """Per-test memory-map census (log via GANLEAKS_MAPCOUNT_LOG=path)
    + the map-pressure release valve described above."""
    yield
    n = _map_count()
    path = os.environ.get("GANLEAKS_MAPCOUNT_LOG")
    if path:
        try:
            with open(path, "a") as f:
                f.write(f"{n}\t{request.node.nodeid}\n")
        except OSError:
            pass
    if n > _MAP_PRESSURE_LIMIT:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
        print(f"\n[conftest] map pressure {n} > {_MAP_PRESSURE_LIMIT}: "
              f"cleared jax caches -> {_map_count()} maps")
