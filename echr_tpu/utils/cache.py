"""Persistent XLA compile cache for CLI entry points.

Compiles through the axon relay's remote_compile can take minutes per
program shape; the on-disk cache makes every rerun of the experiment
scripts, eval CLI, and serving warm-start (bench.py and tests/conftest.py
already do this — reference has no analogue, its framework caches nothing
across processes).
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger("echr_tpu.cache")


def enable_persistent_compile_cache(path: str = None) -> None:
    """Point jax at an on-disk compilation cache.  Default: $ECHR_JAX_CACHE
    or .jax_cache under the current working directory (the repo root when
    experiments/*.sh run).  Never raises — caching is best-effort."""
    import jax

    path = path or os.environ.get(
        "ECHR_JAX_CACHE", os.path.join(os.getcwd(), ".jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log.warning("persistent compile cache unavailable: %s", e)
