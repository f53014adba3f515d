"""Process-level JAX configuration helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    """Enable the persistent XLA compilation cache.

    TPU compiles of the scan-based train step take minutes on small hosts;
    the cache makes them one-time per (program, topology). Safe to call
    multiple times.
    """
    import jax

    cache_dir = path or os.environ.get(
        "EEG_GNN_TPU_CACHE", os.path.expanduser("~/.jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the knobs
