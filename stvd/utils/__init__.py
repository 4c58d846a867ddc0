"""Shared runtime utilities (tracing, NaN debugging, logging)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a writable directory.

    Reference-scale programs take 20-40 s to compile through this
    machine's TPU relay; the cache makes repeat CLI invocations (resume,
    sample-after-train, bench batteries) start in ~1 s.  Shared default
    with bench.py and tests/conftest.py so all three populate the same
    cache.  Override with STVD_CACHE_DIR; empty string disables.
    """
    cache = os.environ.get("STVD_CACHE_DIR", path or "/tmp/jax_cache")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
