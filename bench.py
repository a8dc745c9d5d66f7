"""Headline benchmark: decoded obs-symbols/s/chip on the 2405-state HMM.

Decodes `emit_50_3500_20`-shaped work (3,500-symbol sequences drawn from
the workload) against `2405.chmm` (2,407 states — the largest reference
model), median of BENCH_RUNS timed runs after a warmup (the reference's
median-of-N methodology, ``benchmark/benchmark_helper.h:14,45-66``).

Serving formulation (structured mode): the work list is R rolled copies of
the 50 workload sequences packed into full 512-lane uniform batches — every
decoded lane is a real 3,500-symbol sequence, so the number reports
sustained full-occupancy throughput (round 1 padded 50 sequences to 128
lanes and threw away 61% of the machine). Batches are pre-staged on device
and enqueued back-to-back with ONE blocking drain (the axon tunnel adds
~25 ms per blocking call); per-batch data differs so the runtime cannot
memoize repeats.

``vs_baseline`` is a **workload-level serving comparison**, not a
same-shape kernel ratio: the fused path is measured at its serving
configuration (8 pre-staged 512-lane full-occupancy batches) and the dense
XLA baseline at *its* measured-best configuration (the 50-sequence
workload as one batched program — wider dense batches only lose to HBM).
Each mode gets its best occupancy; the ratio therefore reflects what a
user switching paths observes, and conflates kernel speedup with batching
policy by design (`baseline_mode` in the JSON records this). If the dense
mode fails or times out, ``vs_baseline`` is null rather than a fabricated
1.0.

The JSON line also prints the speed-of-light accounting for the headline:
``us_per_step`` (measured wall µs per 512-lane decode step) against
``floor_us_per_step`` — the measured 3.33 µs/step irreducible quantum
(carry read-modify-write + grid orchestration for 4×128-lane blocks;
BASELINE.md combined-ablation table). ``floor_utilization`` =
floor/measured: the fraction of each step that is the irreducible floor —
the remaining fraction is VMEM-bandwidth-bound streaming measured at
≈7.8 TB/s effective, so values ≈0.3 with ~11 µs/step mean the kernel sits
at the bandwidth roofline, not at a tuning deficit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import contextlib
import json
import signal
import sys
import time

import numpy as np

BENCH_RUNS = 5
# Per-mode wall-clock budget: remote compiles occasionally stall; a hung
# mode must not take the whole benchmark (the driver needs the JSON line).
MODE_TIMEOUT_S = 480

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"

T_LEN = 3500
LANES = 512  # fused-kernel throughput sweet spot (BASELINE.md sweep)
N_BATCHES = 8


@contextlib.contextmanager
def _deadline(seconds: int):
    def _raise(signum, frame):
        raise TimeoutError(f"mode exceeded {seconds}s budget")

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def _median_time(fn, runs: int = BENCH_RUNS) -> float:
    fn()  # warmup (compile)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _packed_work(seqs, lanes: int, n_batches: int):
    """n_batches × lanes sequences of length T_LEN: rolled copies of the
    real workload (distinct data per lane/batch defeats memoization)."""
    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]
    out = []
    for j in range(n_batches):
        batch = [
            np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
            for i in range(lanes)
        ]
        out.append(batch)
    return out


def main() -> None:
    import spec_viterbi_tpu as svt

    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    total_symbols = sum(len(s) for s in seqs)

    def block(out):
        # On the axon tunnel, block_until_ready does not reliably wait for
        # pure-XLA programs; a tiny D2H slice does.
        return np.asarray(out[:1, :1])

    results = {}

    # Structured (fused-kernel) serving throughput: full-lane batches,
    # enqueue all, drain once. A remote compile occasionally stalls past
    # the budget on its FIRST encounter with a shape; the retry almost
    # always succeeds because the compile-server cache keeps whatever the
    # aborted attempt finished (observed: 480s timeout, then 46.5M on the
    # immediate rerun).
    for attempt in range(2):
        try:
            with _deadline(MODE_TIMEOUT_S):
                dec = svt.ViterbiDecoder(hmm, mode="structured")
                handles = [
                    dec.prepare_batch(b)
                    for b in _packed_work(seqs, LANES, N_BATCHES)
                ]

                def run_structured():
                    outs = [dec.run_batch(h) for h in handles]
                    block(outs[-1])

                sec = _median_time(run_structured)
                results["structured"] = N_BATCHES * LANES * T_LEN / sec
                # wall µs per 512-lane step (N_BATCHES×T_LEN steps total)
                results["us_per_step"] = sec * 1e6 / (N_BATCHES * T_LEN)
            break
        except TimeoutError as exc:  # pragma: no cover - stalled compile
            print(
                f"[bench] structured mode attempt {attempt} timed out: {exc}",
                file=sys.stderr,
            )
        except Exception as exc:  # pragma: no cover - deterministic failure
            print(f"[bench] structured mode failed: {exc}", file=sys.stderr)
            break  # retrying an identical deterministic failure is waste

    # Dense XLA baseline: the 50-sequence workload as one batched program
    # (its best configuration), R pipelined repeats, one drain.
    try:
        with _deadline(MODE_TIMEOUT_S):
            dec_d = svt.ViterbiDecoder(hmm, mode="dense")
            handle = dec_d.prepare_batch(seqs)

            def run_dense():
                block(dec_d.run_batch(handle))

            results["dense"] = total_symbols / _median_time(run_dense)
    except Exception as exc:  # pragma: no cover - transient env failures
        print(f"[bench] dense mode failed: {exc}", file=sys.stderr)

    if "structured" not in results and "dense" not in results:
        raise SystemExit("all benchmark modes failed")
    value = max(results.get("structured", 0.0), results.get("dense", 0.0))
    vs = value / results["dense"] if results.get("dense") else None
    us_per_step = results.get("us_per_step")
    # 3.33 µs/step: measured irreducible per-step quantum at 512 lanes
    # (4 × 0.83 µs per 128-lane block·step — BASELINE.md ablation floor).
    floor = 3.33
    print(
        json.dumps(
            {
                "metric": "decoded_obs_symbols_per_s_per_chip_2405",
                "value": round(value, 1),
                "unit": "symbols/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "baseline_mode": "dense-XLA 50-seq batch at its own best "
                "occupancy (workload-level serving comparison, not a "
                "same-shape kernel ratio)",
                "us_per_step": round(us_per_step, 2) if us_per_step else None,
                "floor_us_per_step": floor,
                "floor_utilization": (
                    round(floor / us_per_step, 3) if us_per_step else None
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
