#!/usr/bin/env bash
# Two-process jax.distributed smoke test on CPU devices: a real multi-host
# process group (coordinator + worker), a global mesh spanning both
# processes, and a DP-sharded structured decode validated against the
# oracle. The closest a single machine gets to the N-host story
# (SURVEY.md §2.9) without a pod.
set -euo pipefail
cd "$(dirname "$0")/.."

PORT=${PORT:-12355}

run_proc() {
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=4" \
    SVT_COORD="127.0.0.1:$PORT" SVT_NPROC=2 SVT_PID=$1 \
    python - <<'EOF'
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
from spec_viterbi_tpu.parallel import init_distributed, make_mesh, process_info
from spec_viterbi_tpu.parallel.structured_tp import decode_batch_structured_dp
from spec_viterbi_tpu.io import read_hmm
from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle
from spec_viterbi_tpu.hmm import almost_equal_vec

assert init_distributed(
    coordinator_address=os.environ["SVT_COORD"],
    num_processes=int(os.environ["SVT_NPROC"]),
    process_id=int(os.environ["SVT_PID"]),
)
info = process_info()
assert info["process_count"] == 2 and info["global_devices"] == 8, info

import jax.numpy as jnp
from jax.experimental import multihost_utils

from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.parallel.structured_tp import make_structured_dp_decode
from spec_viterbi_tpu.utils.batching import pad_batch

hmm = read_hmm("/root/reference/chmm_files/100.chmm")
mesh = make_mesh(data=8)  # spans both processes
rng = np.random.default_rng(0)
seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (20, 33)]

sop = StructuredOperator.from_hmm(hmm)
fn = make_structured_dp_decode(sop, mesh)
batch, lengths = pad_batch(seqs, 8 * 8, min_t=2)
n = sop.n
out = fn(
    jnp.asarray(hmm.emission_matrix(pad_to=n).T),
    jnp.asarray(hmm.start_vector(pad_to=n)),
    jnp.asarray(batch.T.copy()),
    jnp.asarray(lengths),
)
# the output spans both processes; gather it for validation
v = np.asarray(multihost_utils.process_allgather(out, tiled=True))
for i, s in enumerate(seqs):
    assert almost_equal_vec(
        v[i, : hmm.states_num], viterbi_scores_oracle(hmm, s)
    ), len(s)
print(f"process {info['process_id']}: multi-process DP decode OK")
EOF
}

run_proc 1 &
WORKER=$!
run_proc 0
wait "$WORKER"
echo "multiprocess smoke OK"
