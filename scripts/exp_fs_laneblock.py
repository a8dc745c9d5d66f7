"""Lane-block-width sweep of the frame-shifted kernel on the real TPU.

The FS A/B proved the step cost is latency-stall bound, not op bound.
The default grid runs each 128-lane block's entire time loop before the
next block — zero ILP across the blocks' independent dependency chains.
This times the headline shape with the whole 512-lane batch as ONE
[Np, 512] VMEM block (and 256 as the midpoint): if stalls dominate,
Mosaic interleaves the 4 independent chains and the step time drops.

Writes bench_out/fs_laneblock.json.
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
                   "bench_out", "fs_laneblock.json")


def main() -> int:
    import jax
    import jax.numpy as jnp

    import spec_viterbi_tpu as svt
    from spec_viterbi_tpu.ops.fused_pallas import (
        BIG_THRESHOLD,
        FusedStructuredDecoder,
    )
    from spec_viterbi_tpu.ops.structured import StructuredOperator

    print("devices:", jax.devices(), flush=True)
    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    assert fd._fs_ok

    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]
    handles = []
    for j in range(N_BATCHES):
        batch = [
            np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
            for i in range(LANES)
        ]
        st, ln, masked = fd.prepare(batch)
        assert not masked
        handles.append(st)

    def make_run(lb: int, unroll: int):
        def f(seqs_t):
            v0 = fd.em_clamped[:, :].take(seqs_t[0], axis=1) + fd.pi[:, None]
            obs = seqs_t[1:, None, :]
            chunks, tail = divmod(obs.shape[0], unroll)
            out = v0
            if chunks:
                out = fd._pallas_fs(
                    out, obs[: chunks * unroll], unroll, lane_block=lb
                )
            if tail:
                out = fd._pallas_fs(
                    out, obs[chunks * unroll :], tail, lane_block=lb
                )
            return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)

        return jax.jit(f)

    ref = np.asarray(make_run(128, 8)(handles[0]))
    results = {}
    for lb, unroll in ((128, 8), (256, 8), (512, 8), (512, 4)):
        run = make_run(lb, unroll)
        got = np.asarray(run(handles[0]))
        ok = bool(np.array_equal(got, ref))
        np.asarray(run(handles[0])[:1, :1])  # warm
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [run(st) for st in handles]
            np.asarray(outs[-1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        key = f"lb{lb}_u{unroll}"
        results[key] = {
            "equal": ok,
            "msym_per_s": round(N_BATCHES * LANES * T_LEN / sec / 1e6, 2),
            "us_per_step": round(sec * 1e6 / (N_BATCHES * T_LEN), 4),
        }
        print(json.dumps({"name": key, **results[key]}), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("FS LANEBLOCK SWEEP COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
