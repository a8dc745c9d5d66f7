"""Produce the complete reference-shaped benchmark artifacts (VERDICT r1 #2).

Reference shape (``main.cpp:5-21``): for each of the 4 sequence datasets,
one non-spec ``.dat`` (all models × execution-mode columns,
``bench_Viterbi.h``) and one spec ``.dat`` (all models × paired prep/decode
columns per impl × level, ``bench_Viterbi_spec.h``). Emits into
``bench_out/`` at the repo root.

Policy choices (documented in bench_out/README.md):
- non-spec: median of 10 (reference's TIMES_TO_RUN); spec: median of 3
  (spec_with rebuilds multi-GB operator stacks; 10× preps would dominate
  the sweep without changing the medians).
- dense-spec level 2 budget: 2 GiB of tuple operators — the reference's
  "used level is based on the memory issues" policy
  (test_semantic_equality.cpp:45-46) applied to HBM: beyond ~1,050 states
  the per-chunk [N,N] operator gather is HBM-bandwidth-bound anyway.
  Over-budget cells are NaN (sum-dat skips them).
- structured spec has no wall and is measured everywhere.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spec_viterbi_tpu.bench.bench_viterbi import (
    ARTIFACT_LEVELS,
    ARTIFACT_MODES,
    ARTIFACT_STRUCT_LEVELS,
    benchmark_viterbi_impls_to_dat_file,
    benchmark_viterbi_spec_impls_to_dat_file,
)

DATASETS = ("emit_3_3500_20", "emit_3_7000_20", "covid-19", "emit_50_3500_20")
CHMM_DIR = "/root/reference/chmm_files"
ESS_DIR = "/root/reference/ess_files"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_out")


def main():
    # NOTE: the JAX persistent compile cache HANGS axon remote compiles
    # (utils/compile_cache.py) — every shape compiles fresh here.
    os.makedirs(OUT_DIR, exist_ok=True)
    t00 = time.time()
    for ds in DATASETS:
        ess = os.path.join(ESS_DIR, f"{ds}.ess")
        t0 = time.time()
        print(f"=== non-spec {ds} ===", flush=True)
        benchmark_viterbi_impls_to_dat_file(
            CHMM_DIR,
            ess,
            os.path.join(OUT_DIR, f"Viterbi_bench_{ds}.dat"),
            modes=ARTIFACT_MODES,
            times_to_run=10,
        )
        print(f"=== non-spec {ds} done in {time.time()-t0:.0f}s ===", flush=True)
    for ds in DATASETS:
        ess = os.path.join(ESS_DIR, f"{ds}.ess")
        t0 = time.time()
        print(f"=== spec {ds} ===", flush=True)
        benchmark_viterbi_spec_impls_to_dat_file(
            CHMM_DIR,
            ess,
            os.path.join(OUT_DIR, f"Viterbi_spec_bench_{ds}.dat"),
            levels=ARTIFACT_LEVELS,
            # level 3 only for the structured store (O(E^L·N) — 1.3 GB at
            # 2405 states where dense would need 176 GiB); the reference
            # tests L3 but cannot bench it anywhere (test_helper.h:23)
            struct_levels=ARTIFACT_STRUCT_LEVELS,
            times_to_run=3,
            prep_times_to_run=3,
            max_spec_bytes=2 << 30,
        )
        print(f"=== spec {ds} done in {time.time()-t0:.0f}s ===", flush=True)
    print(f"ALL ARTIFACTS DONE in {time.time()-t00:.0f}s", flush=True)


if __name__ == "__main__":
    main()
