#!/usr/bin/env bash
# Round-4 TPU measurement queue — run stages in order once the tunnel is
# up. Each stage logs to bench_out/r4_logs/ and is individually
# skippable/resumable: a stage that already produced its marker file is
# skipped, so the queue can be re-run after a tunnel drop. Stage order
# front-loads the cheap compiles (verify warms the flagship shapes so the
# headline bench hits the server-side HLO cache) and the round's
# must-have evidence (VERDICT r3 #1: bench number, time-parallel
# go/no-go, Mosaic window-kernel gate, ragged + spec-L3 artifacts).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
LOGS="$REPO/bench_out/r4_logs"
mkdir -p "$LOGS"

stage() { # name timeout_s command...
  local name="$1" to="$2"; shift 2
  if [ -f "$LOGS/$name.done" ]; then echo "== $name: already done, skip"; return 0; fi
  echo "== $name: start $(date)"
  if timeout "$to" "$@" > "$LOGS/$name.log" 2>&1; then
    touch "$LOGS/$name.done"
    echo "== $name: OK $(date)"
  else
    echo "== $name: FAILED/TIMEOUT (see $LOGS/$name.log)"
    return 1
  fi
}

# 1. verify drive (end-to-end on the real TPU; warms flagship shapes)
stage verify 1200 python scripts/verify_drive.py

# 2. headline benchmark (per-mode subprocess kills; always prints JSON)
stage bench 1800 python bench.py

# 3. time-parallel go/no-go (scan-compose build; k sweep at T=3500)
stage timeparallel 2400 python scripts/exp_time_parallel.py

# 4. fused-TP window kernels meet Mosaic (compile + bit-parity gate)
stage fusedtp 1800 python scripts/exp_fused_tp_mosaic.py

# 5. ragged artifact: multi-model x scores/paths x compute/e2e
stage ragged 3600 python -m spec_viterbi_tpu.cli bench-ragged

# 6. spec artifact with struct L3, canonical dataset first
stage spec_3500 7200 python scripts/spec_artifact_one.py emit_3_3500_20
stage spec_7000 7200 python scripts/spec_artifact_one.py emit_3_7000_20
stage spec_covid 7200 python scripts/spec_artifact_one.py covid-19
stage spec_50 7200 python scripts/spec_artifact_one.py emit_50_3500_20

echo "QUEUE COMPLETE $(date)"
