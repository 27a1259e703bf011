"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding paths are testable without TPU hardware (SURVEY.md §4), and enable
the persistent JAX compilation cache (traversal/render graphs are
compile-heavy; caching cuts repeat suite runs from minutes to seconds).

NOTE: avoid running multiple JAX test processes concurrently in this
container — the baked-in TPU plugin serializes backend initialization across
processes through a single relay and everything crawls.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
