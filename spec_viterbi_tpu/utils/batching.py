"""Shared batch padding for the decode entry points.

Every batched decode pads the sequence set the same way: the batch dimension
up to a device/lane multiple, sequences to the common max length (optionally
a minimum, so kernels always have ≥1 recurrence step), with per-sequence
lengths for masking. One implementation — callers only differ in the batch
multiple and orientation.
"""

from __future__ import annotations

import numpy as np

# Geometric length-quantization grid for bucketed decode: powers of two
# plus the 1.5× midpoints (…, 512, 768, 1024, 1536, 2048, …). Bounds the
# set of compiled kernel shapes (≤2 per octave of sequence length) while
# capping quantization waste at 33% of a bucket's step count.
_T_GRID_BASE = 64


def quantize_t(t: int) -> int:
    """Smallest grid value ≥ t (grid = {64·2^k, 96·2^k})."""
    q = _T_GRID_BASE
    while q < t:
        q3 = q + (q >> 1)
        if q3 >= t:
            return q3
        q <<= 1
    return q


def bucket_plan(
    lengths: list[int],
    lane_block: int = 128,
    min_gain: float = 1.3,
    max_group: int = 512,
) -> list[tuple[list[int], int]] | None:
    """Length-bucketed execution plan for a ragged batch, or None.

    The fused kernel runs every ``lane_block``-lane grid block for the
    batch's COMMON padded length, so one long sequence makes every block
    pay its step count. Sorting by length and cutting the batch into
    per-block buckets lets each bucket run only its own (quantized) max
    length. Returns ``[(original_indices, t_pad), …]`` longest-first, with
    same-``t_pad`` neighbors merged up to ``max_group`` lanes (wider calls
    amortize per-step grid overhead — measured optimum ~512 lanes), or
    None when the padded-step saving is below ``min_gain`` (uniform or
    single-block batches). Purely a host-side plan; no reference analog
    (the reference decodes sequences one at a time, bench_Viterbi.h:53-56).
    """
    b = len(lengths)
    if b <= lane_block:
        return None
    order = sorted(range(b), key=lambda i: -lengths[i])
    blocks = [order[i : i + lane_block] for i in range(0, b, lane_block)]
    buckets: list[tuple[list[int], int]] = []
    for blk in blocks:
        t_q = quantize_t(max(lengths[i] for i in blk))
        if (
            buckets
            and buckets[-1][1] == t_q
            and len(buckets[-1][0]) + len(blk) <= max_group
        ):
            buckets[-1] = (buckets[-1][0] + blk, t_q)
        else:
            buckets.append((blk, t_q))
    lanes_naive = ((b + lane_block - 1) // lane_block) * lane_block
    naive = lanes_naive * max(lengths)
    bucketed = sum(
        ((len(idx) + lane_block - 1) // lane_block) * lane_block * t
        for idx, t in buckets
    )
    if len(buckets) == 1 or naive < min_gain * bucketed:
        return None
    return buckets


def pad_batch(
    seqs: list[np.ndarray], multiple: int, min_t: int = 1, t_pad: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Pad to ``(ceil(B/multiple)·multiple, max(min_t, Tmax))``.

    Returns ``(batch [B_pad, Tmax] int32, lengths [B_pad] int32)``; padding
    symbols are 0 and padding lanes have length 0 (always masked/discarded).
    ``t_pad`` forces the time dimension to a fixed (bucket-quantized)
    length ≥ the batch max, so repeated ragged workloads reuse compiled
    shapes.
    """
    if any(len(s) == 0 for s in seqs):
        # the recurrence consumes seq[0] before any masking (the reference
        # likewise indexes seq[0] unconditionally, GraphBLAS_impl.cpp:59);
        # an empty sequence has no well-defined score vector
        raise ValueError("cannot decode an empty sequence")
    b = len(seqs)
    b_pad = ((b + multiple - 1) // multiple) * multiple
    t_max = max(min_t, max(len(s) for s in seqs))
    if t_pad is not None:
        if t_pad < max(len(s) for s in seqs):
            raise ValueError(f"t_pad={t_pad} below the batch max length")
        t_max = max(min_t, t_pad)
    batch = np.zeros((b_pad, t_max), dtype=np.int32)
    lengths = np.zeros(b_pad, dtype=np.int32)
    for i, s in enumerate(seqs):
        batch[i, : len(s)] = s
        lengths[i] = len(s)
    return batch, lengths
