"""Persistent XLA compilation cache.

Full-width SUPIR graphs take many minutes to compile through the remote
TPU compile service; caching executables on disk makes every run after
the first start in seconds. Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SUPIR_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
