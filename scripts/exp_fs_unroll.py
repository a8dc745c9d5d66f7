"""Frame-shifted kernel unroll sweep on the real TPU.

The FS kernel does less per-substep VPU work than the base kernel, so
the per-grid-step machinery (DMA, realign roll) is a larger fraction —
deeper unrolls may pay where the base kernel spilled (BASELINE.md: base
u5/u7/u10 all lost to u4). Times the headline serving shape at
unroll ∈ {4, 6, 8} through pinned-unroll decoders, plus oracle-free
equality vs the default decoder (bit-identity contract).

Writes bench_out/fs_unroll.json.
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
LANES = 512
N_BATCHES = 16
RUNS = 5

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_out", "fs_unroll2.json")


def main() -> int:
    import jax

    import spec_viterbi_tpu as svt
    from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
    from spec_viterbi_tpu.ops.structured import StructuredOperator

    print("devices:", jax.devices(), flush=True)
    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    sop = StructuredOperator.from_hmm(hmm)
    em = hmm.emission_matrix(pad_to=sop.n)
    pi = hmm.start_vector(pad_to=sop.n)

    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]
    batches = []
    for j in range(N_BATCHES):
        batches.append([
            np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
            for i in range(LANES)
        ])

    ref_fd = FusedStructuredDecoder(sop, em, pi)  # adaptive (u4 at b=512)
    st0, ln0, m0 = ref_fd.prepare(batches[0])
    assert not m0
    ref_scores = np.asarray(ref_fd._jit_run(st0, ln0, masked=False))

    results = {}
    for u in (10, 12, 16):
        fd = FusedStructuredDecoder(sop, em, pi, unroll=u)
        handles = [fd.prepare(b) for b in batches]
        got = np.asarray(fd._jit_run(handles[0][0], handles[0][1], masked=False))
        ok = bool(np.array_equal(got, ref_scores))
        # warmup, then one-drain timing
        np.asarray(fd._jit_run(handles[0][0], handles[0][1], masked=False)[:1, :1])
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [fd._jit_run(st, ln, masked=False) for st, ln, _ in handles]
            np.asarray(outs[-1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        results[f"fs_u{u}"] = {
            "equal": ok,
            "msym_per_s": round(N_BATCHES * LANES * T_LEN / sec / 1e6, 2),
            "us_per_step": round(sec * 1e6 / (N_BATCHES * T_LEN), 4),
        }
        print(json.dumps({"name": f"fs_u{u}", **results[f"fs_u{u}"]}), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("FS UNROLL SWEEP COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
