"""Regenerate the spec `.dat` artifact for ONE dataset (round-3 shape:
dense levels 1-2 + structured levels 1-3). Split out of make_artifacts.py
so tunnel drops cost one dataset, not the whole sweep."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spec_viterbi_tpu.bench.bench_viterbi import (  # noqa: E402
    benchmark_viterbi_spec_impls_to_dat_file,
)

CHMM_DIR = "/root/reference/chmm_files"
ESS_DIR = "/root/reference/ess_files"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_out"
)


def main() -> int:
    ds = sys.argv[1] if len(sys.argv) > 1 else "emit_3_3500_20"
    os.makedirs(OUT_DIR, exist_ok=True)
    t0 = time.time()
    benchmark_viterbi_spec_impls_to_dat_file(
        CHMM_DIR,
        os.path.join(ESS_DIR, f"{ds}.ess"),
        os.path.join(OUT_DIR, f"Viterbi_spec_bench_{ds}.dat"),
        levels=(1, 2),
        struct_levels=(1, 2, 3),
        times_to_run=3,
        prep_times_to_run=3,
        max_spec_bytes=2 << 30,
    )
    print(f"spec {ds} done in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
