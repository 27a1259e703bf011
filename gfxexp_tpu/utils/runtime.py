"""Runtime/bootstrap helpers: persistent compile cache, device info."""

from __future__ import annotations

import os


def _host_tag() -> str:
    """Short hash of the host CPU feature set. XLA:CPU AOT cache entries bake
    in the compile machine's ISA features, and loading them on a different
    host risks SIGILL (observed across round containers) — so the cache dir
    is keyed per host."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")][:1]
        blob = flags[0] if flags else "unknown"
    except OSError:
        blob = "unknown"
    return hashlib.sha1(blob.encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (big win for the render
    graphs, which are compile-heavy). Call before the first jit."""
    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(__file__), "..", "..", ".cache", f"jax-{_host_tag()}"
        )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
