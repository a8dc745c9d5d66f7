"""Lane-block-width sweep of the PATH flow on the real TPU.

Same stall-filling hypothesis as `exp_base_laneblock.py`, applied to the
backpointer-producing kernel + backtrace walk. The path kernel
additionally streams a [1, Np, lb] int16 src block to HBM every step
(2.5 MB/step at b=512/Np=2432 → an HBM-bandwidth bound near ~3 µs/step
is possible where the scores kernels were pure-latency bound). T=512
keeps the src tensor ~1.3 GB.

Sweeps lane_block ∈ {128, 256, 512} through `_path_pallas` /
`_backtrace_pallas` directly, asserts (scores, src, path) bit-equality
across widths, and times the combined flow.

Writes bench_out/path_laneblock.json.
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
T_LEN = 512
LANES = 512
N_BATCHES = 8
RUNS = 5

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bench_out", "path_laneblock.json")


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
    handles = []
    for j in range(N_BATCHES):
        batch = [
            np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN)
            for i in range(LANES)
        ]
        st, ln, masked = fd.prepare(batch)
        handles.append((st, ln, masked))
    masked = handles[0][2]

    def make_run(lb: int):
        # NOTE: src ([T, Np, B] int16 ≈ 1.3 GB) must NOT escape the jit —
        # holding one per enqueued batch OOMs HBM. The timed fn returns
        # only (scores, rev); equality across widths is checked on ONE
        # batch via the sum/hash below.
        def f(seqs_t, lengths):
            v0 = fd.em_clamped[:, :].take(seqs_t[0], axis=1) + fd.pi[:, None]
            obs = seqs_t[1:, None, :]
            out, src = fd._path_pallas(v0, obs, lengths, masked, lane_block=lb)
            scores = jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)
            last = jnp.argmin(scores, axis=0).astype(jnp.int32)[None, :]
            rev = fd._backtrace_pallas(src, last, lane_block=lb)
            # src equality digest without materializing src on host
            digest = jnp.sum(src.astype(jnp.int64) * (1 + (jnp.arange(src.shape[0], dtype=jnp.int64) % 97))[:, None, None])
            return scores, rev, digest

        return jax.jit(f)

    ref = None
    results = {}
    for lb in (128, 256, 512):
        run = make_run(lb)
        st0, ln0, _ = handles[0]
        got = run(st0, ln0)
        got = (np.asarray(got[0]), np.asarray(got[1]), np.asarray(got[2]))
        if ref is None:
            ref = got
            ok = True
        else:
            ok = all(np.array_equal(g, r) for g, r in zip(got, ref))
        np.asarray(run(st0, ln0)[1][:1, :1])  # warm
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            outs = [run(st, ln) for st, ln, _ in handles]
            np.asarray(outs[-1][1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[len(times) // 2]
        key = f"path_lb{lb}"
        results[key] = {
            "equal": ok,
            "msym_per_s": round(N_BATCHES * LANES * T_LEN / sec / 1e6, 2),
            # the flow runs T path-kernel steps + T backtrace steps;
            # report per path-kernel step (comparable to the scores sweeps)
            "us_per_step": round(sec * 1e6 / (N_BATCHES * T_LEN), 4),
        }
        print(json.dumps({"name": key, **results[key]}), flush=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print("PATH LANEBLOCK SWEEP COMPLETE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
