"""TPU experiment: fused-kernel throughput vs lane occupancy / batch blocks.

Round-1 headline (14.9M sym/s) padded 50 real sequences to 128 lanes — 61%
of lanes decoded padding. This measures full-lane throughput at b = 128,
256, 512 with distinct per-repeat data (the axon runtime memoizes repeated
identical computations).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spec_viterbi_tpu as svt
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.ops import fused_pallas

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"


def make_batches(seqs, b, k, t=3500, seed=0):
    """k distinct [t, b] int32 uniform-length batches built from the real
    workload sequences (rolled/permuted fills — distinct buffers)."""
    rng = np.random.default_rng(seed)
    base = np.stack([s[:t] for s in seqs for _ in range(1)])  # [50, t]
    out = []
    for j in range(k):
        rows = []
        i = 0
        while len(rows) < b:
            src = base[i % len(base)]
            rows.append(np.roll(src, (j * 131 + len(rows) * 7) % t))
            i += 1
        out.append(np.stack(rows).T.astype(np.int32).copy())  # [t, b]
    return out


def time_enqueue(fn, batches, lengths, masked):
    """Enqueue one call per batch, block once at the end; returns seconds."""
    outs = []
    t0 = time.perf_counter()
    for bt in batches:
        outs.append(fn(bt, lengths, masked=masked))
    np.asarray(outs[-1][:1, :1])  # real D2H drain
    return time.perf_counter() - t0


def main():
    import jax

    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)
    sop = StructuredOperator.from_hmm(hmm)
    print(
        f"model: n={sop.n} D={len(sop.diag_offsets)} R={len(sop.row_idx)} "
        f"C={len(sop.col_idx)} res={sop.residual_nnz}", flush=True,
    )

    t_len = 3500
    k = 8
    import ast
    configs = ast.literal_eval(os.environ.get("EXP_CONFIGS", "[(2, 1024)]"))
    for unroll, b in configs:
        fd = fused_pallas.FusedStructuredDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            unroll=unroll,
        )
        for b in (b,):
            batches = [
                jax.device_put(x) for x in make_batches(seqs, b, k, t=t_len)
            ]
            lengths = jax.device_put(
                np.full((1, b), t_len, dtype=np.int32)
            )
            # warmup/compile
            np.asarray(fd._jit_run(batches[0], lengths, masked=False)[:1, :1])
            times = []
            for _ in range(3):
                times.append(time_enqueue(fd._jit_run, batches, lengths, False))
            sec = sorted(times)[1]
            syms = k * b * t_len
            us_step = sec / (k * (t_len - 1)) * 1e6
            print(
                f"unroll={unroll} b={b}: {sec*1e3:8.1f} ms for {k} batches "
                f"-> {syms/sec/1e6:7.2f} M sym/s, {us_step:6.2f} us/step",
                flush=True,
            )


if __name__ == "__main__":
    sys.exit(main())
