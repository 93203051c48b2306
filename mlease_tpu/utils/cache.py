"""Persistent XLA compilation cache setup.

The tunneled TPU compiles large while-loop/vmapped programs in tens of
seconds (occasionally minutes); the persistent cache makes every repeated
shape a ~5 s deserialize instead. bench.py points this at the in-repo
.jax_cache (shipped warm for the default bench shapes); CLI runs opt in via
the MLEASE_JAX_CACHE environment variable.
"""

from __future__ import annotations

import os


def _default_cache_dir() -> str | None:
    """The in-repo .jax_cache when the package runs from a checkout (shipped
    warm); otherwise a per-user cache dir. A 100M-scale resume re-paid
    ~530 s of tunnel compile because the CLI ran cacheless — the cache is
    now on by default (MLEASE_JAX_CACHE=\"\" disables; =path overrides)."""
    repo = os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))
    cand = os.path.join(repo, ".jax_cache")
    if os.path.isdir(cand) and os.access(cand, os.W_OK):
        return cand
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    path = os.path.join(base, "mlease_tpu", "jax")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    return path


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache. Returns the dir or None."""
    if default_dir is None:
        default_dir = _default_cache_dir()
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
