"""Persistent XLA compilation cache.

Remote TPU compiles through the axon tunnel cost 30–200 s per new kernel
shape (CLAUDE.md); the benchmark sweep touches ~100 distinct
(model-size × sequence-length) shapes. JAX's persistent compilation cache
works through the tunnel (measured: 1.8 s warm load vs >400 s cold
compile), so every shape compiles once per machine, ever.
"""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache; returns the directory."""
    import jax

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "spec_viterbi_tpu", "jax_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return cache_dir
