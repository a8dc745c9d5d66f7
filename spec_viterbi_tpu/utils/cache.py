"""Persistent specialization-operator cache.

The reference rebuilds all specialized operators on every ``spec_with`` call
and keeps them only in RAM/VRAM (``GraphBLAS_spec_impl.cpp:45-48``;
SURVEY.md §5 "Checkpoint / resume: none"). This cache is the TPU-native
extension: precomputed operator stacks are persisted and loaded straight to
HBM on the next specialization — prep cost is paid once per model per
machine.

Format (v2): one directory per ``(hmm fingerprint, level, padded size)``
holding one ``.npy`` per array. Loads are **memory-mapped**, so a warm
``spec_with`` costs milliseconds regardless of operator size — pages fault
in lazily on first use, and execution paths that never touch the big
level-L stacks (the fused factored kernel) never pay for them at all.
Stores are atomic: arrays are written into a temp directory that is
renamed into place (a concurrent writer losing the race just discards its
copy).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np

_FORMAT_VERSION = 2


class OperatorCache:
    """File-backed cache of specialized operator stacks."""

    def __init__(self, cache_dir: str | None = None):
        self.cache_dir = cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "spec_viterbi_tpu"
        )

    def _path(self, fingerprint: str, level: int, padded: int) -> str:
        return os.path.join(
            self.cache_dir,
            f"ops_v{_FORMAT_VERSION}_{fingerprint}_L{level}_N{padded}",
        )

    def load(self, fingerprint: str, level: int, padded: int):
        """Returns dict of (memory-mapped) arrays or None on miss/corruption."""
        path = self._path(fingerprint, level, padded)
        if not os.path.isdir(path):
            return None
        try:
            out = {}
            for f in sorted(os.listdir(path)):
                if f.endswith(".npy"):
                    out[f[:-4]] = np.load(os.path.join(path, f), mmap_mode="r")
            return out or None
        except Exception:
            # corrupt cache entry: drop it, rebuild
            shutil.rmtree(path, ignore_errors=True)
            return None

    def store_async(
        self, fingerprint: str, level: int, padded: int, arrays: dict
    ) -> "threading.Thread":
        """Publish in a background thread (the level-3 Pfam stack is
        ~1.3 GB — a synchronous write would double ``spec_with`` cold
        time). The atomic rename-publish means a process exiting mid-write
        leaves only a discarded temp directory, never a corrupt entry.
        Arrays are only read, so the caller may keep using them."""
        import threading

        t = threading.Thread(
            target=self.store,
            args=(fingerprint, level, padded, arrays),
            daemon=True,
        )
        t.start()
        return t

    def store(self, fingerprint: str, level: int, padded: int, arrays: dict) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        path = self._path(fingerprint, level, padded)
        tmp = tempfile.mkdtemp(dir=self.cache_dir, suffix=".tmp")
        try:
            for k, a in arrays.items():
                np.save(os.path.join(tmp, f"{k}.npy"), np.asarray(a))
            try:
                os.rename(tmp, path)  # atomic publish
            except OSError:
                # another process published first — keep theirs
                shutil.rmtree(tmp, ignore_errors=True)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
