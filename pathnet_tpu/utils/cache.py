"""Persistent XLA compilation cache.

Host CPUs in TPU VMs are often few and slow; recompiling identical programs
every process wastes minutes.  Enabling the JAX persistent cache makes every
jit after the first process instant for unchanged shapes.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "PATHNET_TPU_CACHE", os.path.expanduser("~/.cache/pathnet_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
