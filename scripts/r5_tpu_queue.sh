#!/usr/bin/env bash
# Round-5 TPU measurement queue — resumable (stage markers in
# bench_out/r5_logs/). Stage order front-loads the round's must-have
# evidence (VERDICT r4 #1-3, #8): verify drive warms the flagship
# shapes, the corpus re-stamp proves the current kernel on all 24
# models, the headline bench lands the canonical number, then the
# roofline audit (VMEM copy baseline + bf16-operand + two-symbol
# falsification experiments) and the fused-TP window timing.
# Experiment stages are existence-guarded so the queue can be started
# before they are written and re-run after (done markers skip phase 1).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
LOGS="$REPO/bench_out/r5_logs"
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

# --- phase 1: evidence re-stamp (VERDICT #3) ---
stage verify 1800 python scripts/verify_drive.py
stage corpus 7200 python scripts/corpus_sweep_tpu.py
stage bench 1800 python bench.py

# --- phase 2: roofline audit + TP timing (VERDICT #1, #8) ---
[ -f scripts/exp_roofline.py ] && stage roofline 3600 python scripts/exp_roofline.py
[ -f scripts/exp_fused_tp_time.py ] && stage fusedtp_time 3600 python scripts/exp_fused_tp_time.py

echo "QUEUE COMPLETE $(date)"
