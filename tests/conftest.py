"""Test configuration: force CPU backend with 8 virtual devices so multi-chip
sharding paths are testable without TPU hardware (SURVEY.md §4), and enable
the persistent JAX compilation cache (traversal/render graphs are
compile-heavy; caching cuts repeat suite runs from minutes to seconds).

NOTE: avoid running multiple JAX test processes concurrently in this
container — the baked-in TPU plugin serializes backend initialization across
processes through a single relay and everything crawls.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

_NEEDS_REEXEC = jax.devices()[0].platform != "cpu" or len(jax.devices()) < 8


def pytest_configure(config):
    """jax may be preimported at interpreter startup (sitecustomize registers
    the TPU plugin and binds JAX_PLATFORMS=axon), making the env vars above
    too late. Re-exec the whole pytest process with a scrubbed env: no plugin
    registration, CPU platform, 8 virtual devices. Done here (not at import)
    so pytest's fd-level capture can be torn down first — otherwise the
    exec'd child inherits fds pointing at orphaned capture files and all
    output is lost."""
    if not _NEEDS_REEXEC:
        return
    if os.environ.get("_GFXEXP_TEST_CHILD") == "1":
        raise RuntimeError("scrubbed test env still lacks an 8-device CPU mesh")
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_GFXEXP_TEST_CHILD"] = "1"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import numpy as np  # noqa: E402
import pytest  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from gfxexp_tpu.utils.runtime import enable_compile_cache  # noqa: E402

if not _NEEDS_REEXEC:
    enable_compile_cache()


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory_per_module():
    """Release compiled executables between test modules: the full suite
    accumulates every module's jitted programs in one process and the
    heaviest late modules (tfdm's unrolled v1 marcher) started
    segfaulting once the suite grew past ~120 tests (r3). Cross-module
    compile reuse is negligible; per-module recompiles are cheap next to
    a SIGSEGV."""
    yield
    gc.collect()
    jax.clear_caches()
