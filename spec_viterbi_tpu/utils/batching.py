"""Shared batch padding for the decode entry points.

Every batched decode pads the sequence set the same way: the batch dimension
up to a device/lane multiple, sequences to the common max length (optionally
a minimum, so kernels always have ≥1 recurrence step), with per-sequence
lengths for masking. One implementation — callers only differ in the batch
multiple and orientation.
"""

from __future__ import annotations

import numpy as np


def pad_batch(
    seqs: list[np.ndarray], multiple: int, min_t: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Pad to ``(ceil(B/multiple)·multiple, max(min_t, Tmax))``.

    Returns ``(batch [B_pad, Tmax] int32, lengths [B_pad] int32)``; padding
    symbols are 0 and padding lanes have length 0 (always masked/discarded).
    """
    if any(len(s) == 0 for s in seqs):
        # the recurrence consumes seq[0] before any masking (the reference
        # likewise indexes seq[0] unconditionally, GraphBLAS_impl.cpp:59);
        # an empty sequence has no well-defined score vector
        raise ValueError("cannot decode an empty sequence")
    b = len(seqs)
    b_pad = ((b + multiple - 1) // multiple) * multiple
    t_max = max(min_t, max(len(s) for s in seqs))
    batch = np.zeros((b_pad, t_max), dtype=np.int32)
    lengths = np.zeros(b_pad, dtype=np.int32)
    for i, s in enumerate(seqs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    return batch, lengths
