"""Regenerate bench_out/scaling_cpu_mesh.jsonl: end-to-end execution of
the CURRENT production DP paths across virtual-mesh sizes.

What a virtual CPU mesh DOES represent: that the sharded programs
(fused-kernel DP via shard_map, streaming DP feeds, dense DP) compile,
execute, and produce oracle-correct results at every mesh size — the
multi-chip code path is real.

What it does NOT represent: hardware scaling efficiency. All virtual
devices share this host's cores, the fused kernel runs in Pallas
interpret mode (orders of magnitude slower than compiled Mosaic), and
collectives are memcpys. Wall-clock here says NOTHING about 1→N-chip
efficiency; the ≥80% scaling argument rests on the communication
accounting instead (bench_out/scaling_comm.jsonl: the fused/structured DP
programs contain ZERO per-step collectives at any mesh size, so per-chip
throughput is the measured single-chip number and efficiency equals lane
occupancy — BASELINE.md "TP communication accounting & scaling model").
The throughput_sym_s column is recorded only to document the run; the
meaningful fields are ok/oracle_checked.

Replaces the round-1 artifact (dense-path-only, predates the fused DP and
streaming DP paths, and recorded virtual-mesh "efficiency" numbers that
invited misreading as hardware data).

Run: python scripts/scaling_cpu_mesh.py
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spec_viterbi_tpu.hmm import almost_equal_vec  # noqa: E402
from spec_viterbi_tpu.io import read_hmm  # noqa: E402
from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle  # noqa: E402
from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder  # noqa: E402
from spec_viterbi_tpu.ops.structured import StructuredOperator  # noqa: E402
from spec_viterbi_tpu.parallel import (  # noqa: E402
    StreamDP,
    decode_batch_dp_fused,
    make_mesh,
)

CHMM = os.path.join(os.path.dirname(REPO), "reference", "chmm_files", "500.chmm")
T = 48


def main() -> int:
    hmm = read_hmm(CHMM)
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        interpret=True,
    )
    rng = np.random.default_rng(0)
    rows = []
    for d in (1, 2, 4, 8):
        mesh = make_mesh(data=d)
        lanes = 128 * d
        seqs = [
            rng.integers(0, hmm.emit_num, size=T).astype(np.int32)
            for _ in range(lanes)
        ]
        t0 = time.perf_counter()
        got = decode_batch_dp_fused(fd, seqs, mesh)
        dt = time.perf_counter() - t0
        ok = all(
            almost_equal_vec(g, viterbi_scores_oracle(hmm, s))
            for g, s in zip(got[:2], seqs[:2])
        )
        rows.append(
            {
                "path": "decode_batch_dp_fused",
                "devices": d,
                "lanes": lanes,
                "ok": bool(ok),
                "oracle_checked": True,
                "throughput_sym_s": round(lanes * T / dt, 1),
            }
        )

        sdp = StreamDP(fd, mesh)
        block = rng.integers(0, hmm.emit_num, size=(T, lanes)).astype(np.int32)
        t0 = time.perf_counter()
        st = sdp.begin(block[0])
        st = sdp.feed(st, block[1:])
        scores = sdp.scores(st)
        dt = time.perf_counter() - t0
        ok = almost_equal_vec(
            scores[0, : hmm.states_num], viterbi_scores_oracle(hmm, block[:, 0])
        )
        rows.append(
            {
                "path": "stream_dp",
                "devices": d,
                "lanes": lanes,
                "ok": bool(ok),
                "oracle_checked": True,
                "throughput_sym_s": round(lanes * T / dt, 1),
            }
        )

    bad = [r for r in rows if not r["ok"]]
    if bad:  # never exit 0 on an oracle mismatch (ADVICE r3)
        raise SystemExit(f"oracle mismatch in rows: {bad}")

    out = os.path.join(REPO, "bench_out", "scaling_cpu_mesh.jsonl")
    with open(out, "w") as f:
        f.write(
            "# Virtual-CPU-mesh EXECUTION sweep of the production DP paths "
            "(fused-kernel shard_map DP + streaming DP), interpret-mode "
            "kernels, oracle-checked. throughput_sym_s is NOT hardware-"
            "representative (virtual devices share host cores; interpret "
            "mode): scaling-efficiency evidence lives in scaling_comm.jsonl "
            "(zero per-step collectives -> efficiency = lane occupancy). "
            "Replaces the round-1 dense-path sweep.\n"
        )
        for r in rows:
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
