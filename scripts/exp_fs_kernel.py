"""Frame-shifted kernel A/B on the real TPU (round-5 follow-on).

Measures the headline serving shape (2405.chmm, 512 uniform 3,500-symbol
lanes, 16 pre-staged batches, one drain) two ways through the SAME
decoder object:

- ``base``: ``masked=True`` — the round-5 unrolled kernel (the mask never
  fires at uniform lengths, so this is exactly the 102.4M sym/s kernel).
- ``fs``:   ``masked=False`` — the frame-shifted kernel
  (``_make_fs_kernel``): no per-substep carry roll (pre-rolled operand
  stacks + one realign roll per grid step) and the shared column reduce
  folded into the store chain.

Also fetches one full [512, Np] score block from each and asserts exact
array equality — the bit-identity contract the CPU interpret tests pin
(`tests/test_fused.py::test_frame_shifted_kernel_bit_identical_to_base`),
re-proved under real Mosaic lowering.

Writes bench_out/fs_kernel.json and prints one JSON line per entry.
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
                   "bench_out", "fs_kernel.json")


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
    assert fd._fs_ok, "2405.chmm must be frame-shift eligible"

    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]
    handles = []
    for j in range(N_BATCHES):
        batch = [
            np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
            for i in range(LANES)
        ]
        st, ln, masked = fd.prepare(batch)
        assert not masked
        handles.append((st, ln))

    # --- bit-identity under real Mosaic, full block ---
    st, ln = handles[0]
    got_fs = np.asarray(fd._jit_run(st, ln, masked=False))
    got_base = np.asarray(fd._jit_run(st, ln, masked=True))
    if not np.array_equal(got_fs, got_base):
        diff = np.nanmax(np.abs(got_fs - got_base))
        print(json.dumps({"name": "fs_equality", "ok": False,
                          "max_abs_diff": float(diff)}), flush=True)
        return 1
    print(json.dumps({"name": "fs_equality", "ok": True}), flush=True)

    results = {"fs_equality": {"ok": True}}

    def timed(masked: bool) -> float:
        # warmup / compile
        np.asarray(fd._jit_run(*handles[0], masked=masked)[:1, :1])
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [fd._jit_run(st, ln, masked=masked) for st, ln in handles]
            np.asarray(outs[-1][:1, :1])  # one drain (tunnel: D2H blocks)
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    for name, m in (("base", True), ("fs", False)):
        sec = timed(m)
        sym_s = N_BATCHES * LANES * T_LEN / sec
        us_step = sec * 1e6 / (N_BATCHES * T_LEN)
        results[name] = {
            "msym_per_s": round(sym_s / 1e6, 2),
            "us_per_step": round(us_step, 4),
        }
        print(json.dumps({"name": name, **results[name]}), flush=True)

    results["speedup"] = round(
        results["base"]["us_per_step"] / results["fs"]["us_per_step"], 3
    )
    print(json.dumps({"name": "speedup", "value": results["speedup"]}), flush=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("FS KERNEL A/B COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
