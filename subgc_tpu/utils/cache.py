"""Persistent XLA compilation cache.

The axon-tunneled TPU compiler is slow for the larger batched inference
programs (minutes); caching compiled executables on disk makes every rerun
(and the driver's bench invocations) start hot.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("SUBGC_COMPILE_CACHE",
                              os.path.expanduser("~/.cache/subgc_jax_cache"))


def enable_compilation_cache(path: str = _DEFAULT_DIR) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:      # older jax: flag names differ; cache is a
        print(f"compilation cache unavailable: {e}")    # nice-to-have only
