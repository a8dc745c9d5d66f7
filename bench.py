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

Stall-proofing (round-4 redesign — the round-3 number was lost to a hung
remote compile): **each mode runs in its own subprocess** with a hard
wall-clock kill. An in-process ``SIGALRM`` deadline cannot preempt a
Python thread blocked inside a native tunnel call (observed round 3: the
alarm fired, logged, and then the process sat 17 more minutes until the
driver's outer ``timeout`` destroyed the whole run, dense baseline
included); ``os.killpg`` on the child's own process group can. The parent
always prints the JSON line with whatever modes completed — a dense-only
line is valid output; only all-modes-failed exits nonzero. Total
worst-case wall clock (structured + one retry + dense, compiles INSIDE
the budgets) is ~16 min, under the driver's observed window. Fault
injection for the unit test: ``SVT_BENCH_FAULT=hang=<mode>;stub=<mode>``
replaces a child's work with an uninterruptible-style sleep / a canned
result, exercising the kill + salvage logic without a TPU
(``tests/test_bench_harness.py``).

The JSON line also prints the speed-of-light accounting for the headline:
``us_per_step`` (measured wall µs per 512-lane decode step) against
``floor_us_per_step`` — the measured 1.89 µs/step irreducible quantum
(the unroll-4 empty kernel at the production ONE-wide-512-lane-block
grid: carry read-modify-write + one add + store per substep;
``bench_out/fs_laneblock2.json`` empty_lb512_u4).
``floor_utilization`` = floor/measured. What closed the gap to the
floor: the 128-lane-block grid ran each block's whole time loop with
zero ILP across blocks, so the serialized substep dependency chain +
MXU latency dominated (the frame-shifted A/B proved the stall — a
kernel with the roll and reduce passes eliminated measured 1.006×);
one WIDE 512-lane block hands Mosaic 4 independent per-block chains
per substep to interleave into those stalls (BASELINE.md round-5
lane-block section, ``bench_out/fs_laneblock*.json``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BENCH_RUNS = 5

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"

T_LEN = 3500
LANES = 512  # fused-kernel throughput sweet spot (BASELINE.md sweep)
# 16 pre-staged batches: the one blocking drain (~25 ms tunnel round trip)
# amortizes over ~620 ms of enqueued device work instead of ~310 ms —
# raising the sustained number toward the kernel's true rate (round 2 used
# 8; every lane is still a real 3,500-symbol workload sequence).
N_BATCHES = 16

# Per-mode wall-clock budgets (seconds), compiles included. Overridable via
# env for the fault-injection test. Worst case total:
# STRUCTURED + RETRY + DENSE ≈ 16 min < the driver's window.
def _budget(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


RESULT_TAG = "SVT_BENCH_RESULT "  # child stdout line prefix (tunnel noise-proof)


def _fault_modes(kind: str) -> set[str]:
    """Parse SVT_BENCH_FAULT='hang=structured;stub=dense' → modes for kind."""
    out = set()
    for part in os.environ.get("SVT_BENCH_FAULT", "").split(";"):
        if "=" in part:
            k, v = part.split("=", 1)
            if k.strip() == kind:
                out.update(m.strip() for m in v.split(",") if m.strip())
    return out


# ---------------------------------------------------------------------------
# child side: one mode, one process
# ---------------------------------------------------------------------------


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


def _block(out):
    # On the axon tunnel, block_until_ready does not reliably wait for
    # pure-XLA programs; a tiny D2H slice does.
    return np.asarray(out[:1, :1])


def _child_structured() -> dict:
    import spec_viterbi_tpu as svt

    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    dec = svt.ViterbiDecoder(hmm, mode="structured")
    handles = [dec.prepare_batch(b) for b in _packed_work(seqs, LANES, N_BATCHES)]

    def run_structured():
        outs = [dec.run_batch(h) for h in handles]
        _block(outs[-1])

    sec = _median_time(run_structured)
    return {
        "structured": N_BATCHES * LANES * T_LEN / sec,
        # wall µs per 512-lane step (N_BATCHES×T_LEN steps total)
        "us_per_step": sec * 1e6 / (N_BATCHES * T_LEN),
    }


def _child_dense() -> dict:
    import spec_viterbi_tpu as svt

    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    total_symbols = sum(len(s) for s in seqs)
    dec_d = svt.ViterbiDecoder(hmm, mode="dense")
    handle = dec_d.prepare_batch(seqs)

    def run_dense():
        _block(dec_d.run_batch(handle))

    return {"dense": total_symbols / _median_time(run_dense)}


def _run_child(mode: str) -> int:
    if mode in _fault_modes("hang"):  # pragma: no branch - test-only path
        while True:  # simulate a native call SIGALRM can't preempt
            time.sleep(3600)
    if mode in _fault_modes("fail"):  # deterministic child failure
        sys.exit(3)
    if mode in _fault_modes("stub"):
        results = (
            {"structured": 46.5e6, "us_per_step": 11.0}
            if mode == "structured"
            else {"dense": 152e3}
        )
    else:
        results = {"structured": _child_structured, "dense": _child_dense}[mode]()
    print(RESULT_TAG + json.dumps(results), flush=True)
    return 0


# ---------------------------------------------------------------------------
# parent side: orchestrate children with hard wall-clock kills
# ---------------------------------------------------------------------------


def _run_mode(mode: str, timeout_s: int) -> tuple[str, dict | None]:
    """One mode in its own process group; SIGKILL the group on timeout
    (the child's exact pgid — never a pattern kill). Returns
    ``(status, result)`` with status in {"ok", "timeout", "failed"} — the
    caller retries ONLY timeouts (a nonzero child exit is deterministic;
    re-running an identical failure wastes the retry budget)."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", mode],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        start_new_session=True,  # own pgid so the kill reaps helper procs too
    )
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:  # pragma: no cover - raced exit
            pass
        proc.wait()
        print(f"[bench] {mode} mode killed after {timeout_s}s", file=sys.stderr)
        return "timeout", None
    if proc.returncode != 0:
        print(
            f"[bench] {mode} mode exited rc={proc.returncode}", file=sys.stderr
        )
        return "failed", None
    for line in out.splitlines():
        if line.startswith(RESULT_TAG):
            return "ok", json.loads(line[len(RESULT_TAG):])
    print(f"[bench] {mode} mode printed no result line", file=sys.stderr)
    return "failed", None


def main() -> int:
    results: dict = {}

    # Structured (fused-kernel) serving throughput. A remote compile
    # occasionally stalls on its FIRST encounter with a shape; the retry
    # usually succeeds because the compile-server cache keeps whatever the
    # killed attempt finished. The retry budget is shorter: it should be
    # hitting warm caches. Deterministic (non-timeout) failures are NOT
    # retried.
    status, got = _run_mode(
        "structured", _budget("SVT_BENCH_TIMEOUT_STRUCTURED", 420)
    )
    if status == "timeout":
        _, got = _run_mode("structured", _budget("SVT_BENCH_TIMEOUT_RETRY", 300))
    if got:
        results.update(got)

    # Dense XLA baseline — runs REGARDLESS of what structured did (round 3
    # lost the entire number because one structured stall starved this).
    _, got = _run_mode("dense", _budget("SVT_BENCH_TIMEOUT_DENSE", 240))
    if got:
        results.update(got)

    if "structured" not in results and "dense" not in results:
        print("[bench] all modes failed", file=sys.stderr)
        return 1
    value = max(results.get("structured", 0.0), results.get("dense", 0.0))
    vs = value / results["dense"] if results.get("dense") else None
    us_per_step = results.get("us_per_step")
    # Measured irreducible per-step quantum at the production config —
    # ONE 512-lane block / unroll 4: the empty kernel (carry RMW + one
    # add + store per substep over the [Np, 512] block) costs
    # 1.89 µs/step (bench_out/fs_laneblock2.json empty_lb512_u4; the
    # 128-lane-block figure was 1.08 but the wide block quadruples the
    # per-substep elementwise footprint while filling the dependency
    # stalls — see BASELINE.md lane-block section).
    floor = 1.89
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
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        sys.exit(_run_child(sys.argv[2]))
    sys.exit(main())
