"""Persistent XLA compilation cache.

**Do NOT enable on the axon TPU backend.** Measured behavior: a small
kernel round-trips fine (1.8 s warm load), but enabling the cache makes
real decode-scan compiles HANG (>400 s and counting; the same program
compiles in 33 s with the cache off) — the axon PJRT plugin's executable
serialization appears to deadlock the remote-compile helper. Nothing in
the library calls this by default; it remains useful for CPU runs (the
virtual-mesh test suite) where it behaves normally.
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
