"""Single-lane-block chain latency vs the wide-block headline (real TPU).

The committed "5 us/step structural floor" was a 4-serialized-block
figure (block-outer grid): this pins the per-block chain latency by
decoding a LONE 128-lane batch (grid (1, T)) against the routed 512-lane
wide block. Evidence for the BASELINE.md lane-block section's per-block
restatement and the DP no-cliff note.

Writes bench_out/single_block.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"
T_LEN = 3500
N_BATCHES = 16
RUNS = 5

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_out", "single_block.json")


def main() -> int:
    import jax

    import spec_viterbi_tpu as svt
    from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
    from spec_viterbi_tpu.ops.structured import StructuredOperator

    print("devices:", jax.devices(), flush=True)
    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]

    results = {}
    for lanes in (128, 512):
        handles = []
        for j in range(N_BATCHES):
            batch = [
                np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
                for i in range(lanes)
            ]
            st, _, masked = fd.prepare(batch)
            assert not masked
            handles.append(st)
        run = jax.jit(lambda st: fd._scores_core(st, None, False))
        np.asarray(run(handles[0])[:1, :1])  # warm
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [run(st) for st in handles]
            np.asarray(outs[-1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        key = f"b{lanes}_routed"
        results[key] = {
            "us_per_step": round(sec * 1e6 / (N_BATCHES * T_LEN), 4),
            "msym_per_s": round(N_BATCHES * lanes * T_LEN / sec / 1e6, 2),
        }
        print(json.dumps({"name": key, **results[key]}), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("SINGLE BLOCK SWEEP COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
