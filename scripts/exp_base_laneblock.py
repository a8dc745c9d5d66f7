"""Lane-block-width sweep of the BASE (maskable) kernel on the real TPU.

The FS lane-block sweep (`exp_fs_laneblock.py`) proved the grid's
128-lane blocks serialized independent dependency chains and that one
wide [Np, 512] block lets Mosaic interleave them (5.47 -> 2.43 us/step).
The base kernel has the same block-outer grid and the same serialized
substep chain, plus the per-substep roll and per-lane length masking —
this measures whether the same lever transfers to (a) the unmasked base
kernel (non-FS-eligible operator classes) and (b) the masked ragged
path (bucketed batches), at b=512, Np=2432.

Writes bench_out/base_laneblock.json.
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
N_BATCHES = 8
RUNS = 5

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_out", "base_laneblock.json")


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

    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]

    def staged(ragged: bool):
        handles = []
        for j in range(N_BATCHES):
            batch = []
            for i in range(LANES):
                s = np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
                if ragged:  # vary lengths so prepare keeps the mask
                    s = s[: T_LEN - ((i * 37) % 500)]
                batch.append(s)
            st, ln, masked = fd.prepare(batch)
            assert masked == ragged
            handles.append((st, ln))
        return handles

    def make_run(masked: bool, lb: int, unroll: int):
        def f(seqs_t, lengths):
            v0 = fd.em_clamped[:, :].take(seqs_t[0], axis=1) + fd.pi[:, None]
            obs = seqs_t[1:, None, :]
            chunks, tail = divmod(obs.shape[0], unroll)
            out = v0
            if chunks:
                out = fd._pallas(
                    out, obs[: chunks * unroll], lengths, masked, unroll, 0,
                    lane_block=lb,
                )
            if tail:
                out = fd._pallas(
                    out, obs[chunks * unroll :], lengths, masked, tail,
                    chunks * unroll, lane_block=lb,
                )
            return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)

        return jax.jit(f)

    results = {}
    for masked in (False, True):
        handles = staged(masked)
        tag = "masked" if masked else "plain"
        ref = np.asarray(make_run(masked, 128, 4)(*handles[0]))
        for lb, unroll in ((128, 4), (256, 4), (512, 4), (512, 2)):
            run = make_run(masked, lb, unroll)
            got = np.asarray(run(*handles[0]))
            ok = bool(np.array_equal(got, ref))
            np.asarray(run(*handles[0])[:1, :1])  # warm
            times = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                outs = [run(st, ln) for st, ln in handles]
                np.asarray(outs[-1][:1, :1])
                times.append(time.perf_counter() - t0)
            sec = sorted(times)[len(times) // 2]
            key = f"{tag}_lb{lb}_u{unroll}"
            results[key] = {
                "equal": ok,
                "msym_per_s": round(N_BATCHES * LANES * T_LEN / sec / 1e6, 2),
                "us_per_step": round(sec * 1e6 / (N_BATCHES * T_LEN), 4),
            }
            print(json.dumps({"name": key, **results[key]}), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("BASE LANEBLOCK SWEEP COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
