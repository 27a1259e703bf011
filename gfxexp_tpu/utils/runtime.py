"""Runtime/bootstrap helpers: persistent compile cache, device info."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (big win for the render
    graphs, which are compile-heavy). Call before the first jit."""
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "..", "..", ".cache", "jax")
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
