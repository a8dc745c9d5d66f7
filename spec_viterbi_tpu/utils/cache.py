"""Persistent specialization-operator cache.

The reference rebuilds all specialized operators on every ``spec_with`` call
and keeps them only in RAM/VRAM (``GraphBLAS_spec_impl.cpp:45-48``;
SURVEY.md §5 "Checkpoint / resume: none"). This cache is the TPU-native
extension: precomputed operator stacks are persisted as ``.npz`` keyed by
``(hmm fingerprint, level, padded size)`` and loaded straight to HBM on the
next specialization — prep cost is paid once per model per machine.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

_FORMAT_VERSION = 1


class OperatorCache:
    """File-backed cache of specialized operator stacks."""

    def __init__(self, cache_dir: str | None = None):
        self.cache_dir = cache_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "spec_viterbi_tpu"
        )

    def _path(self, fingerprint: str, level: int, padded: int) -> str:
        return os.path.join(
            self.cache_dir, f"ops_v{_FORMAT_VERSION}_{fingerprint}_L{level}_N{padded}.npz"
        )

    def load(self, fingerprint: str, level: int, padded: int):
        """Returns dict of arrays or None on miss/corruption."""
        path = self._path(fingerprint, level, padded)
        if not os.path.exists(path):
            return None
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            # corrupt cache entry: drop it, rebuild
            try:
                os.remove(path)
            except OSError:
                pass
            return None

    def store(self, fingerprint: str, level: int, padded: int, arrays: dict) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)
        path = self._path(fingerprint, level, padded)
        # atomic publish: write to a temp file, rename into place
        fd, tmp = tempfile.mkstemp(dir=self.cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **arrays)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
