"""Time-parallel single-sequence go/no-go measurement (VERDICT r2 #1).

Question: does lanes-as-time-blocks composition beat the serial one-lane
fused kernel for a single T=3500 sequence on the 2405-state model, and by
how much? Target: ≥5× or a measured negative result for BASELINE.md.

Measures, tunnel-safely (enqueue N, drain once; distinct inputs per rep):
- serial one-lane fused kernel latency (the baseline: 1 lane of a
  128-lane block, ~3.66 µs/step device-side),
- time-parallel compose+fold+tail scores latency for k in the sweep,
- time-parallel exact-path latency (block remat via the fused path
  kernel),
- parity: scores vs oracle (±1.0 contract) and max drift vs the serial
  path; path equality vs the oracle.

Run on the TPU: python scripts/exp_time_parallel.py [--t 3500] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_3_3500_20.ess"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ks", nargs="+", type=int, default=[4, 8, 16, 32])
    ap.add_argument(
        "--composes", nargs="+", default=["scan", "tree"],
        help="block-compose schedules to sweep (tree: k/log2(k) less HBM "
             "traffic, needs power-of-two k)",
    )
    ap.add_argument("--model", default=CHMM)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (interpret-mode fused engine; timings "
                         "not hardware-representative)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    
    from spec_viterbi_tpu.hmm import almost_equal_vec
    from spec_viterbi_tpu.io import read_emit_seq, read_hmm
    from spec_viterbi_tpu.models.oracle import (
        viterbi_path_oracle,
        viterbi_scores_oracle,
    )
    from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
    from spec_viterbi_tpu.ops.structured import StructuredOperator
    from spec_viterbi_tpu.ops.time_parallel import TimeParallelDecoder

    hmm = read_hmm(args.model)
    sop = StructuredOperator.from_hmm(hmm)
    em = hmm.emission_matrix(pad_to=sop.n)
    pi = hmm.start_vector(pad_to=sop.n)
    fd = FusedStructuredDecoder(sop, em, pi, interpret=args.cpu)

    base = read_emit_seq(ESS)[0][: args.t].astype(np.int32)
    rng = np.random.default_rng(0)
    # distinct sequences per rep (the runtime memoizes identical repeats)
    seqs = [np.roll(base, 97 * i) for i in range(args.reps + 1)]

    def drain(x):
        return np.asarray(x)[:1]

    results = {}

    # ---- serial baseline: one-lane fused call, enqueue all reps, one drain
    handles = [fd.prepare([s]) for s in seqs]
    outs = [fd._jit_run(*h[:2], masked=h[2]) for h in handles]  # warm compile
    drain(outs[-1])
    t0 = time.perf_counter()
    outs = [fd._jit_run(*h[:2], masked=h[2]) for h in handles]
    drain(outs[-1])
    serial_ms = (time.perf_counter() - t0) / len(seqs) * 1e3
    results["serial_one_lane_ms"] = round(serial_ms, 3)
    print(f"serial one-lane fused: {serial_ms:.2f} ms/seq", flush=True)

    oracle = viterbi_scores_oracle(hmm, seqs[0])
    _, opath = viterbi_path_oracle(hmm, seqs[0])
    serial_scores = fd.decode_batch([seqs[0]], bucketed=False)[0]

    for k in args.ks:
      for compose in args.composes:
        if compose == "tree" and (k & (k - 1)):
            continue
        tp = TimeParallelDecoder(sop, em, pi, k=k, compose=compose)
        # correctness first
        got = tp.decode(seqs[0])
        ok_oracle = bool(almost_equal_vec(got, oracle))
        finite = np.isfinite(oracle[: hmm.states_num]) & np.isfinite(
            got[: hmm.states_num]
        )
        drift = float(
            np.max(
                np.abs(
                    got[: hmm.states_num][finite]
                    - serial_scores[: hmm.states_num][finite]
                )
            )
        ) if finite.any() else 0.0
        psc, ppath = tp.decode_path(seqs[0], engine=fd)
        ok_path = bool(np.array_equal(ppath, opath))

        # scores latency: enqueue compose+fold for all reps, drain once
        def run_scores(s):
            v, _, _, _, _ = tp._decode_parts(s)
            return v

        outs = [run_scores(s) for s in seqs]  # warm
        drain(outs[-1])
        t0 = time.perf_counter()
        outs = [run_scores(s) for s in seqs]
        drain(outs[-1])
        tp_ms = (time.perf_counter() - t0) / len(seqs) * 1e3

        # path latency (includes remat + backtrace + host assembly; has
        # unavoidable per-call drains) — timed per call
        t0 = time.perf_counter()
        for s in seqs[: max(2, args.reps // 2)]:
            tp.decode_path(s, engine=fd)
        tp_path_ms = (
            (time.perf_counter() - t0) / max(2, args.reps // 2) * 1e3
        )

        results[f"k{k}_{compose}"] = {
            "scores_ms": round(tp_ms, 3),
            "speedup_vs_serial": round(serial_ms / tp_ms, 2),
            "path_ms": round(tp_path_ms, 3),
            "ok_oracle": ok_oracle,
            "ok_path_exact": ok_path,
            "max_drift_vs_serial": drift,
            "slots": int(tp.r1 * k),
            "band": int(tp.w_band),
        }
        print(
            f"k={k} {compose}: {json.dumps(results[f'k{k}_{compose}'])}",
            flush=True,
        )

    print(json.dumps(results))
    if args.cpu:
        print("cpu smoke OK (no artifact written)")
        return 0
    out = os.path.join(REPO, "bench_out", "time_parallel_go_no_go.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
