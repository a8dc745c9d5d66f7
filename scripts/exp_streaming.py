"""Long-context streaming measurement: exact-path decode far past the
one-shot backpointer wall.

One-shot path decode of [T, B] needs a device-resident [T-1, Np, B] int16
tensor: at T=100k, B=128 lanes, Np=2432 that is ~62 GB — infeasible on any
single chip. Streaming (checkpoint + rematerialize) holds one chunk's
backpointers at a time (~1.9 GB at T_c=3072) plus one O(Np·B) checkpoint
per chunk (~40 MB total), so T is unbounded.

Protocol (axon tunnel rules, CLAUDE.md): feeds chain on-device and are
enqueued back-to-back; the single drain is the scores D2H. Correctness at
this scale is established by the composition tests (bit-identical chunk
carry) — here a T=4097 prefix is additionally cross-checked one-shot.

Run on the TPU: python scripts/exp_streaming.py [--t 100001] [--chunk 3072]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spec_viterbi_tpu.io import read_hmm  # noqa: E402
from spec_viterbi_tpu.ops.fused_pallas import (  # noqa: E402
    FusedStructuredDecoder,
)
from spec_viterbi_tpu.ops.structured import StructuredOperator  # noqa: E402

CHMM = "/root/reference/chmm_files/2405.chmm"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=100_001)
    ap.add_argument("--chunk", type=int, default=3072)
    ap.add_argument("--lanes", type=int, default=128)
    args = ap.parse_args()

    hmm = read_hmm(CHMM)
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    rng = np.random.default_rng(7)
    block = rng.integers(0, hmm.emit_num, size=(args.t, args.lanes)).astype(
        np.int32
    )

    # correctness cross-check on a one-shot-feasible prefix
    t_small = 4097
    st = fd.stream_begin_path(block[0])
    for pos in range(1, t_small, args.chunk):
        st = fd.stream_feed_path(st, block[pos : min(pos + args.chunk, t_small)])
    sc_s, path_s = fd.stream_path_finalize(st)
    one = fd.decode_path_batch([block[:t_small, i] for i in range(args.lanes)])
    for i in range(args.lanes):
        assert np.array_equal(path_s[i], one[i][1]), f"prefix mismatch lane {i}"
        assert np.array_equal(
            np.nan_to_num(sc_s[i], posinf=-1),
            np.nan_to_num(one[i][0], posinf=-1),
        ), i
    print(f"prefix T={t_small}: streaming == one-shot on {args.lanes} lanes")

    # forward pass (warm shapes from the prefix): enqueue all feeds, one drain
    t0 = time.perf_counter()
    st = fd.stream_begin_path(block[0])
    for pos in range(1, args.t, args.chunk):
        st = fd.stream_feed_path(st, block[pos : pos + args.chunk])
    scores = fd.stream_path_scores(st)  # the blocking drain
    fwd = time.perf_counter() - t0
    n_chunks = len(st.chunks)

    t0 = time.perf_counter()
    scores2, paths = fd.stream_path_finalize(st)
    fin = time.perf_counter() - t0
    assert paths.shape == (args.lanes, args.t)
    assert np.array_equal(scores, scores2)

    syms = args.t * args.lanes
    onepass_gib = (args.t - 1) * sop.n * args.lanes * 2 / 2**30
    print(
        f"T={args.t} lanes={args.lanes} chunks={n_chunks} "
        f"(ckpt mem {n_chunks * sop.n * args.lanes * 4 / 2**20:.0f} MiB, "
        f"one-shot bp would need {onepass_gib:.1f} GiB)"
    )
    print(
        f"forward {fwd:.2f} s ({syms / fwd / 1e6:.1f}M sym/s) | "
        f"finalize {fin:.2f} s | total {fwd + fin:.2f} s "
        f"({syms / (fwd + fin) / 1e6:.1f}M sym/s exact-path)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
