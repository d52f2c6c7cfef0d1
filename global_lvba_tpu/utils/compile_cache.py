"""Persistent XLA compilation cache.

The reference is an offline tool that runs once per dataset
(/root/reference/src/main.cpp:4-11) — its C++ binary pays compilation at
build time, while a fresh JAX process pays XLA compiles at RUN time:
measured ladder-3 cold start 110.8 s vs 9.0 s steady (BASELINE.md).  For
the end user, cold IS the experience, so every entry point enables JAX's
persistent (cross-process) compilation cache by default: a second run of
the same pipeline shape deserializes executables instead of recompiling.

Resolution order for the cache directory:
  1. $JAX_COMPILATION_CACHE_DIR (standard JAX env var)
  2. $LVBA_COMPILE_CACHE ("" or "0" disables entirely)
  3. ~/.cache/global_lvba_tpu/xla
"""

from __future__ import annotations

import os

_done = False


def enable_persistent_cache() -> str | None:
    """Idempotently point jax at a persistent compilation cache dir.

    Returns the directory in use, or None when disabled/unavailable.
    min_compile_time is set to 0 so even small executables (the split-LM
    step programs, CLI warmup shapes) are reused across processes."""
    global _done
    override = os.environ.get("LVBA_COMPILE_CACHE")
    if override in ("", "0"):
        return None
    cache_dir = (
        os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or override
        or os.path.join(
            os.path.expanduser("~"), ".cache", "global_lvba_tpu", "xla")
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        if not _done:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0)
            _done = True
        return cache_dir
    except Exception:  # never let cache plumbing break a solve
        return None
