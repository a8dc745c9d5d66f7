"""Fused-TP window-kernel THROUGHPUT on one chip (VERDICT r4 #8).

Round 4 proved the window kernels Mosaic-compile bit-exactly
(`bench_out/fused_tp_mosaic.json`); this measures what they COST. On a
real K-shard pod every shard runs its [n_win, B] window kernel in
parallel, one call per `chunk` steps, plus one halo collective-permute
per chunk — so the per-window step cost measured here bounds the
pod-projected TP speedup from above (halos free) and quantifies the
per-window overhead a pod amortizes:

    pod_speedup_K  ≤  unsharded_us_per_step / window_us_per_step(K)
    serial_overhead_K = K · window_us_per_step(K) / unsharded_us_per_step

Model: banded (offsets 1, 3) at the production width (2432 padded
states), the chunked-halo class's domain — coupled operators (dense
rows/cols) take the per-step 64 B halo TP instead (BASELINE.md round 3).
Writes bench_out/fused_tp_time.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np
from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.parallel.fused_tp import FusedTPDecoder

N = 2432
B = 128
T = 3520  # multiple of chunk
CHUNK = 16
REPS = 3

RESULTS: dict = {}


def emit(name, payload):
    RESULTS[name] = payload
    print(json.dumps({"name": name, **payload}), flush=True)


def banded_hmm(n=N, offsets=(1, 3), emit_n=4, seed=0):
    """Random banded HMM (tests/test_fused_tp.py:21-41 generator)."""
    rng = np.random.default_rng(seed)
    rows, cols, probs = [], [], []
    for d in offsets:
        src = np.arange(max(0, -d), n - max(0, d))
        rows.append(src)
        cols.append(src + d)
        probs.append(rng.uniform(0.05, 1.0, size=src.shape[0]))
    return HMM(
        states_num=n,
        emit_num=emit_n,
        trans_rows=np.concatenate(rows).astype(np.int64),
        trans_cols=np.concatenate(cols).astype(np.int64),
        trans_probs=to_modified_prob_np(np.concatenate(probs)),
        emissions=to_modified_prob_np(rng.uniform(0.05, 1.0, size=(emit_n, n))),
        start_probabilities_cols=np.arange(8, dtype=np.int64),
        start_probabilities=to_modified_prob_np(np.full(8, 1 / 8)),
    )


def time_scanned(run, v0s, obs_all_list, total_steps: int) -> float:
    """us/step of a ONE-dispatch jitted chunk scan (the production TP
    program's structure — per-call host dispatch through the tunnel costs
    ~0.9 ms and would swamp a 16-step window call)."""
    np.asarray(run(v0s[0], obs_all_list[0])[:1, :1])  # warmup/compile
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        o1 = run(v0s[2 * r + 1], obs_all_list[2 * r + 1])
        o2 = run(v0s[2 * r + 2], obs_all_list[2 * r + 2])
        np.asarray(o2[:1, :1])
        _ = o1
        times.append(time.perf_counter() - t0)
    return sorted(times)[REPS // 2] / (2 * total_steps) * 1e6


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    hmm = banded_hmm()
    sop = StructuredOperator.from_hmm(hmm)
    assert not sop.row_idx and not sop.col_idx and sop.residual_nnz == 0
    rng = np.random.default_rng(0)

    # ---- unsharded reference: the production kernel at the same lanes --
    fd = FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    batches = [
        jax.device_put(rng.integers(0, hmm.emit_num, size=(T, B)).astype(np.int32))
        for _ in range(REPS * 2 + 1)
    ]
    lengths = jax.device_put(np.full((1, B), T, np.int32))
    np.asarray(fd._jit_run(batches[0], lengths, masked=False)[:1, :1])
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        o1 = fd._jit_run(batches[2 * r + 1], lengths, masked=False)
        o2 = fd._jit_run(batches[2 * r + 2], lengths, masked=False)
        np.asarray(o2[:1, :1])
        times.append(time.perf_counter() - t0)
    unsharded = sorted(times)[REPS // 2] / (2 * (T - 1)) * 1e6
    emit("unsharded", {"us_per_step": round(unsharded, 4)})

    # ---- per-window kernel cost at K shards ----------------------------
    for shards in (4, 8):
        tp = FusedTPDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            mesh=None,
            shards=shards,
            chunk=CHUNK,
        )
        s0 = 1 * tp.block  # an interior shard's window
        dv_win = tp._dv_pad[s0 : s0 + tp.n_win]
        em_win = tp._em_split_pad[s0 : s0 + tp.n_win]
        len_c = np.full((1, B), CHUNK + 1, np.int32)
        n_chunks = T // CHUNK

        @jax.jit
        def run(v0, obs_all, dv_win=dv_win, em_win=em_win):
            len_d = jnp.asarray(len_c)

            def body(v, obs_c):
                return tp._pallas_win(v, dv_win, em_win, obs_c, len_d), None

            v, _ = jax.lax.scan(body, v0, obs_all)
            return v

        v0s = [
            jax.device_put(
                rng.normal(20.0, 3.0, size=(tp.n_win, B)).astype(np.float32)
            )
            for _ in range(REPS * 2 + 1)
        ]
        obs_all = [
            jax.device_put(
                rng.integers(
                    0, hmm.emit_num, size=(n_chunks, CHUNK, 1, B)
                ).astype(np.int32)
            )
            for _ in range(REPS * 2 + 1)
        ]
        us = time_scanned(run, v0s, obs_all, n_chunks * CHUNK)
        emit(
            f"window_k{shards}",
            {
                "us_per_step": round(us, 4),
                "n_win": tp.n_win,
                "block": tp.block,
                "halo_rows": tp.h_lo + tp.h_hi,
                "pod_speedup_upper_bound": round(unsharded / us, 3),
                "serial_overhead": round(shards * us / unsharded, 3),
            },
        )

    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/fused_tp_time.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("FUSED TP TIME COMPLETE", flush=True)


if __name__ == "__main__":
    main()
