"""Mosaic-compile the fused-TP window kernels on the real chip (VERDICT r3 #4).

Round 3 validated the chunked-halo TP schedule only in interpret mode on
the CPU mesh — the window-shaped ``_pallas_win`` / ``_path_pallas_win``
kernels (n_win rows, dynamic-sliced operands) had never met Mosaic, so a
layout rejection (e.g. the 128-alignment rules for lane-dim dynamic
slices) would have surfaced first on a real pod. This script compiles
both kernels at production-banded shapes on the one real chip via the
mesh-less window harness (``FusedTPDecoder.decode_batch_emulated``),
parity-checks interior rows bit-for-bit against the unsharded fused
kernel, records compile wall time, and writes
``bench_out/fused_tp_mosaic.json``. Exits nonzero on any rejection or
mismatch — this is the gate the drive queue runs.

Run on the TPU: python scripts/exp_fused_tp_mosaic.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    small = "--small" in sys.argv[1:]  # CPU smoke of the harness logic
    import jax

    if small:
        jax.config.update("jax_platforms", "cpu")

    from spec_viterbi_tpu.hmm import almost_equal_vec
    from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle
    from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
    from spec_viterbi_tpu.ops.structured import StructuredOperator
    from spec_viterbi_tpu.parallel.fused_tp import FusedTPDecoder, fused_tp_supported
    from test_fused_tp import banded_hmm

    backend = jax.default_backend()
    if not small and backend != "tpu":
        # the gate's whole point is Mosaic; an interpret-mode pass would
        # be a false green and must not produce the hardware artifact
        print(f"refusing to run the Mosaic gate on backend={backend!r}")
        return 2
    interpret = backend != "tpu"
    results = {"backend": backend, "cases": []}

    # production-banded shapes: corpus-scale N, 4-shard window, chunk 16
    cases = [
        {"n": 2432, "offsets": (1,), "shards": 4, "chunk": 16},
        {"n": 2432, "offsets": (-1, 1), "shards": 4, "chunk": 16},
    ]
    if small:
        cases = [{"n": 256, "offsets": (1,), "shards": 2, "chunk": 8}]
    for case in cases:
        n, offsets = case["n"], tuple(case["offsets"])
        shards, chunk = case["shards"], case["chunk"]
        hmm = banded_hmm(n=n, offsets=offsets, emit=20, seed=sum(map(abs, offsets)))
        sop = StructuredOperator.from_hmm(hmm)
        assert fused_tp_supported(sop, shards, chunk), case
        em = hmm.emission_matrix(pad_to=sop.n)
        pi = hmm.start_vector(pad_to=sop.n)
        tp = FusedTPDecoder(
            sop, em, pi, mesh=None, shards=shards, chunk=chunk, interpret=interpret
        )
        fd = FusedStructuredDecoder(sop, em, pi, interpret=interpret)

        rng = np.random.default_rng(17)
        seqs = [
            rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
            for t in [3 * chunk + 5] * 8 + [2, chunk + 1]
        ]
        t0 = time.perf_counter()
        got = tp.decode_batch_emulated(seqs, check_path_kernel=True)
        compile_s = time.perf_counter() - t0  # first call: Mosaic compile

        want = fd.decode_batch(seqs, bucketed=False)
        mismatches = sum(
            not np.array_equal(
                np.nan_to_num(g, posinf=-1), np.nan_to_num(w, posinf=-1)
            )
            for g, w in zip(got, want)
        )
        ok_oracle = bool(
            almost_equal_vec(got[0], viterbi_scores_oracle(hmm, seqs[0]))
        )
        row = {
            **case,
            "n_win": tp.n_win,
            "block": tp.block,
            "first_call_s": round(compile_s, 2),
            "bit_exact_vs_unsharded": mismatches == 0,
            "ok_oracle": ok_oracle,
            "path_kernel_score_parity": True,  # checked in-call (raises)
        }
        results["cases"].append(row)
        print(json.dumps(row), flush=True)
        if mismatches or not ok_oracle:
            print(f"FAILED: {mismatches} mismatches, oracle={ok_oracle}")
            return 1

    if small:  # smoke run: never overwrite the hardware artifact
        print("smoke OK (no artifact written)")
        return 0
    out = os.path.join(REPO, "bench_out", "fused_tp_mosaic.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
