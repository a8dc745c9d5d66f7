"""Produce bench_out/scaling_comm.jsonl: collective-traffic accounting
for every sharded decode path at multiple mesh sizes.

Hardware-independent scaling evidence (VERDICT r1 weak #4): wall-clock
efficiency on the virtual CPU mesh is meaningless (8 virtual devices share
4 host cores), but the *communication structure* of the compiled programs
is exactly what a real pod would execute. This script compiles each
sharded path on the virtual mesh and records the collective payload bytes
parsed from the HLO (`utils/comm.py`); the decode scan compiles to one
`while` body, so static collective bytes ARE the per-step traffic.

What the rows establish:
- DP (`make_structured_dp_decode`): zero collectives at ANY mesh size —
  1→N-chip efficiency equals lane occupancy (the ≥80% north-star argument,
  BASELINE.md "TP communication accounting & scaling model").
- halo-TP: per-step bytes independent of model size (O(components)·B).
- dense-TP: per-step bytes grow with N (the term halo-TP removes).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/scaling_comm_artifact.py
"""

from __future__ import annotations

import json
import os
import sys

# The axon sitecustomize pre-registers the TPU backend; override via
# jax.config after import (same pattern as tests/conftest.py).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spec_viterbi_tpu.io import read_hmm  # noqa: E402
from spec_viterbi_tpu.ops.structured import StructuredOperator  # noqa: E402
from spec_viterbi_tpu.parallel import make_mesh  # noqa: E402
from spec_viterbi_tpu.parallel.sharded import make_dp_tp_decode  # noqa: E402
from spec_viterbi_tpu.parallel.structured_tp import (  # noqa: E402
    make_structured_dp_decode,
    make_structured_tp_decode,
)
from spec_viterbi_tpu.utils.comm import collective_payload_bytes  # noqa: E402

CHMM_DIR = os.path.join(os.path.dirname(REPO), "reference", "chmm_files")
B, T = 8, 6  # tiny shapes: traffic structure is shape-static per lane/step


def _sop_args(sop: StructuredOperator, emit_num: int):
    n = sop.n
    return (
        jnp.zeros((max(1, sop.diag_vals.shape[0]), n), jnp.float32),
        jnp.zeros((max(1, sop.row_vals.shape[0]), n), jnp.float32),
        jnp.zeros((max(1, sop.col_vals.shape[0]), n), jnp.float32),
        jnp.zeros((1, max(1, sop.residual_nnz)), jnp.float32),
        jnp.zeros((n, emit_num), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((T, B), jnp.int32),
        jnp.full((B,), T, jnp.int32),
    )


def main() -> int:
    rows = []
    for model in ("100.chmm", "1200.chmm", "2405.chmm"):
        hmm = read_hmm(os.path.join(CHMM_DIR, model))
        sop = StructuredOperator.from_hmm(hmm)
        args = _sop_args(sop, hmm.emit_num)

        dp_args = args[4:]  # (em_t, pi, seqs_t, lengths)
        for d in (1, 2, 4, 8):
            mesh = make_mesh(data=d)
            fn = make_structured_dp_decode(sop, mesh)
            hlo = fn.lower(*dp_args).compile().as_text()
            rows.append(
                {
                    "path": "dp_structured",
                    "model": model,
                    "n_states": int(sop.n),
                    "mesh": {"data": d},
                    "per_step_collective_bytes": collective_payload_bytes(hlo),
                }
            )

        for s in (2, 4, 8):
            mesh = make_mesh(state=s)
            fn = make_structured_tp_decode(sop, mesh)
            hlo = fn.lower(*args).compile().as_text()
            rows.append(
                {
                    "path": "halo_tp_structured",
                    "model": model,
                    "n_states": int(sop.n),
                    "mesh": {"state": s},
                    "per_step_collective_bytes": collective_payload_bytes(hlo),
                }
            )

        # DP-sharded streaming feed: per-shard fused kernels, must show
        # zero collectives like the one-shot DP path
        from spec_viterbi_tpu.ops.fused_pallas import (
            FusedStructuredDecoder,
            fused_eligible,
        )
        from spec_viterbi_tpu.parallel.sharded import StreamDP

        if fused_eligible(sop):
            fdec = FusedStructuredDecoder(
                sop,
                hmm.emission_matrix(pad_to=sop.n),
                hmm.start_vector(pad_to=sop.n),
                interpret=True,
            )
            for d in (2, 8):
                sdp = StreamDP(fdec, make_mesh(data=d))
                carry = jnp.zeros((sop.n, d * 128), jnp.float32)
                chunk = jnp.zeros((64, d * 128), jnp.int8)
                lens = jnp.zeros((1, d * 128), jnp.int32)
                hlo = (
                    sdp._feed_fn.lower(carry, chunk, lens).compile().as_text()
                )
                rows.append(
                    {
                        "path": "stream_dp_feed",
                        "model": model,
                        "n_states": int(sop.n),
                        "mesh": {"data": d},
                        "per_step_collective_bytes": collective_payload_bytes(
                            hlo
                        ),
                    }
                )

        # dense TP: the all-gather-the-carry design halo-TP replaces
        n = sop.n
        a_t = jnp.zeros((n, n), jnp.float32)
        em_t = jnp.zeros((n, hmm.emit_num), jnp.float32)
        pi = jnp.zeros((n,), jnp.float32)
        seqs_t = jnp.zeros((T, B), jnp.int32)
        lengths = jnp.full((B,), T, jnp.int32)
        for s in (2, 4, 8):
            mesh = make_mesh(data=1, state=s)
            fn = make_dp_tp_decode(mesh)
            hlo = fn.lower(a_t, pi, em_t, seqs_t, lengths).compile().as_text()
            rows.append(
                {
                    "path": "dense_tp",
                    "model": model,
                    "n_states": int(n),
                    "mesh": {"state": s},
                    "per_step_collective_bytes": collective_payload_bytes(hlo),
                }
            )

    # fused-kernel TP (chunked halo, banded operators): collectives fire
    # once per CHUNK (the scan body), so the recorded bytes are per-chunk;
    # amortized per-step traffic = bytes / chunk
    from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np
    from spec_viterbi_tpu.parallel.fused_tp import FusedTPDecoder

    nb_states = 256
    brng = np.random.default_rng(3)
    src = np.arange(nb_states - 1, dtype=np.int64)
    bhmm = HMM(
        states_num=nb_states,
        emit_num=4,
        trans_rows=src,
        trans_cols=src + 1,
        trans_probs=to_modified_prob_np(brng.uniform(0.1, 1.0, size=nb_states - 1)),
        emissions=to_modified_prob_np(brng.uniform(0.1, 1.0, size=(4, nb_states))),
        start_probabilities_cols=np.arange(4, dtype=np.int64),
        start_probabilities=to_modified_prob_np(np.full(4, 0.25)),
    )
    bsop = StructuredOperator.from_hmm(bhmm)
    for s, chunk in ((2, 8), (4, 8), (4, 16), (8, 8)):
        tp = FusedTPDecoder(
            bsop,
            bhmm.emission_matrix(pad_to=bsop.n),
            bhmm.start_vector(pad_to=bsop.n),
            make_mesh(state=s),
            chunk=chunk,
            interpret=True,
        )
        b = 128
        hlo = (
            tp._decode.lower(
                tp._dv_pad,
                tp._em_pad,
                tp._pi_pad,
                jnp.zeros((3 * chunk + 1, b), jnp.int32),
                jnp.full((b,), 3 * chunk + 1, jnp.int32),
            )
            .compile()
            .as_text()
        )
        payload = collective_payload_bytes(hlo)
        rows.append(
            {
                "path": "fused_tp_chunked",
                "model": "banded-256 (synthetic; Pfam models are coupled "
                "and route to halo_tp — see parallel/fused_tp.py)",
                "n_states": int(bsop.n),
                "mesh": {"state": s},
                "chunk_steps": chunk,
                "per_CHUNK_collective_bytes": payload,
                "per_step_collective_bytes_amortized": {
                    k: v / chunk for k, v in payload.items()
                },
            }
        )

    out = os.path.join(REPO, "bench_out", "scaling_comm.jsonl")
    with open(out, "w") as f:
        f.write(
            "# Collective payload bytes per decode step, parsed from compiled "
            "HLO (utils/comm.py), virtual CPU mesh (communication structure "
            "is identical to a real pod's program). B=8 lanes. DP rows: {} "
            "means ZERO collectives at any mesh size. CAVEAT: payloads are "
            "each collective's RESULT shape — exact for collective-permute, "
            "an UPPER BOUND for all-gather/all-reduce (the result includes "
            "the local shard, overstating moved bytes by the 1/shards "
            "fraction); fine for the orders-of-magnitude halo-vs-dense "
            "argument, do not read as wire-exact. fused_tp_chunked rows "
            "record bytes per CHUNK (see fields).\n"
        )
        for r in rows:
            f.write(json.dumps(r) + "\n")
            print(json.dumps(r))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
