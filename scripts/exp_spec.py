"""TPU experiment: level-2 structured-spec decode throughput.

Compares the two spec realizations on the 2405-state x emit_50_3500_20
workload at full 512-lane occupancy:

- fused/factored: precomputed level-1 structured operators applied
  ``level`` symbols per grid step inside the whole-sequence Pallas kernel
- composed: stored level-2 component vectors gathered per-lane tuple index
  and applied via XLA (HBM-bound: the gather streams ~50 MB/chunk-step)

Plus single-sequence latency for both (the reference's actual run_spec
shape) vs the non-spec fused kernel.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import spec_viterbi_tpu as svt
from spec_viterbi_tpu.models.spec_structured import StructuredSpecializedViterbi

CHMM = "/root/reference/chmm_files/2405.chmm"
ESS = "/root/reference/ess_files/emit_50_3500_20.ess"
T_LEN = 3500
LANES = 512
K = 8


def packed(seqs, lanes, k):
    base = [np.asarray(s[:T_LEN], dtype=np.int32) for s in seqs]
    return [
        [np.roll(base[i % len(base)], (j * 131 + i * 7) % T_LEN) for i in range(lanes)]
        for j in range(k)
    ]


def main():
    hmm = svt.read_hmm(CHMM)
    seqs = svt.read_emit_seq(ESS)

    spec = StructuredSpecializedViterbi(level=2)
    t0 = time.perf_counter()
    spec.spec_with(hmm)
    print(f"spec_with(level=2): {time.perf_counter()-t0:.2f}s; "
          f"components={spec.num_components} fused={spec._fused is not None}",
          flush=True)

    # ---- fused/factored batched throughput --------------------------------
    fd = spec._fused
    handles = [fd.prepare(b) for b in packed(seqs, LANES, K)]
    np.asarray(fd.run_prepared(handles[0])[:1, :1])  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fd.run_prepared(h) for h in handles]
        np.asarray(outs[-1][:1, :1])
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[1]
    print(f"fused L2 spec batched: {K*LANES*T_LEN/sec/1e6:.2f} M sym/s "
          f"({sec*1e3:.1f} ms)", flush=True)

    # ---- composed batched throughput --------------------------------------
    comp = StructuredSpecializedViterbi(level=2, use_pallas=False)
    comp.spec_with(hmm)
    batch = np.stack(packed(seqs, LANES, 1)[0], axis=1)  # [T, B]
    bd = jax.device_put(jnp.asarray(batch))
    np.asarray(comp._decode_batch_uniform(bd)[:1, :1])  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(comp._decode_batch_uniform(bd)[:1, :1])
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[1]
    print(f"composed L2 spec batched (XLA gather): "
          f"{LANES*T_LEN/sec/1e6:.2f} M sym/s ({sec*1e3:.1f} ms/batch)",
          flush=True)

    # ---- single-sequence latency ------------------------------------------
    one = [np.asarray(seqs[0][:T_LEN], dtype=np.int32)]
    for name, fn in (
        ("fused L2 spec", lambda: spec.run_spec_batch(one)),
        ("composed L2 spec", lambda: comp.run_spec(one[0])),
    ):
        fn()  # compile
        times = []
        for r in range(5):
            one_r = [np.roll(one[0], r + 1)]
            t0 = time.perf_counter()
            if "fused" in name:
                spec.run_spec_batch(one_r)
            else:
                comp.run_spec(one_r[0])
            times.append(time.perf_counter() - t0)
        print(f"{name} single-seq: {sorted(times)[2]*1e3:.1f} ms "
              f"({T_LEN/sorted(times)[2]/1e3:.0f}k sym/s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
