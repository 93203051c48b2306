"""Persistent XLA compilation cache setup.

The tunneled TPU compiles large while-loop/vmapped programs in tens of
seconds (occasionally minutes); the persistent cache makes every repeated
shape a ~5 s deserialize instead. bench.py points this at the in-repo
.jax_cache (shipped warm for the default bench shapes); CLI runs opt in via
the MLEASE_JAX_CACHE environment variable.
"""

from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache. Returns the dir or None."""
    cache_dir = os.environ.get("MLEASE_JAX_CACHE", default_dir)
    if not cache_dir:
        return None
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None
    return cache_dir
