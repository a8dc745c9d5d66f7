"""Unified execution-route scheduler: the DP/TP/SP tradeoff as code.

The framework has grown several execution regimes — single-chip batched
decode (fused Pallas / structured XLA / dense XLA), data-parallel fused
decode over a mesh, two tensor-parallel schedules (per-step halo exchange
vs chunked-halo with the fused kernel), time-parallel single-sequence
decode, and two streaming engines. Round 3 documented the decision table
in BASELINE.md but left route choice to the caller; SURVEY.md §5 calls
for the DP-vs-SP/TP tradeoff to be "a tunable scheduling decision" —
this module makes it one (VERDICT r3 #5 / next #5).

``plan_route(hmm, workload, mesh) → Route`` encodes the measured table:

- **DP is the throughput tool, always** (BASELINE.md round-3 decision
  table): zero per-step collectives, 1→N efficiency = lane occupancy.
  Any materialized multi-sequence workload on a multi-device mesh routes
  to data parallelism; on one device, to the batched decoder (which
  internally picks fused/structured/dense — that sub-choice stays in
  :class:`~spec_viterbi_tpu.models.decoder.ViterbiDecoder`).
- **TP is the capacity/latency tool.** Chosen only when the model's
  device-resident arrays exceed the per-chip HBM budget, or when the
  caller optimizes latency on a model big enough that a shard's step is
  meaningfully faster than the whole (N ≳ 10⁴ at the measured ~0.83 µs
  per 128-lane block·step quantum). Within TP the operator class decides
  the schedule: banded operators chunk
  (:class:`~spec_viterbi_tpu.parallel.fused_tp.FusedTPDecoder`,
  2 ppermutes per chunk); coupled operators provably need per-step
  exchange and keep the 64 B/step halo TP
  (:mod:`~spec_viterbi_tpu.parallel.structured_tp`).
- **Time parallelism is opt-in only.** The round-4 hardware go/no-go
  (BASELINE.md, ``bench_out/time_parallel_go_no_go.json``) measured
  lanes-as-time-blocks composition
  (:class:`~spec_viterbi_tpu.ops.time_parallel.TimeParallelDecoder`) at
  0.29–0.95× of the serial one-lane fused decode at every k — the fused
  kernel's serial step is already near the VMEM-bandwidth floor. A long
  single sequence therefore routes to the batched decoder; the
  time-parallel route remains exact and executable behind
  ``Workload.prefer_time_parallel`` / ``cli decode --time-parallel``.
- **Streaming engine by eligibility**: fused Pallas engine for
  fused-eligible operators, the XLA fallback for everything else — the
  same protocol either way.

The reference has no scheduling at all (single backend object per run,
``main.cpp:4-23``); this is the TPU-native extension that makes the
multi-regime framework usable without knowing the regime names.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spec_viterbi_tpu.hmm import HMM
from spec_viterbi_tpu.ops.structured import StructuredOperator

# Decision thresholds (measured rationale in BASELINE.md).
HBM_BYTES_DEFAULT = 16 << 30  # v5e per-chip HBM
TP_LATENCY_STATES = 10_000  # below this, a shard's step isn't faster
TIME_PARALLEL_MIN_T = 512  # shorter sequences: dispatch dominates
TP_CHUNK_DEFAULT = 16
TIME_PARALLEL_K_DEFAULT = 8


@dataclasses.dataclass(frozen=True)
class Workload:
    """Shape of the work to schedule (not the data itself)."""

    n_seqs: int
    max_len: int
    total_symbols: int = 0
    paths: bool = False  # exact Viterbi paths required?
    streaming: bool = False  # unbounded/incremental input?
    optimize: str = "throughput"  # or "latency"
    hbm_bytes: int = HBM_BYTES_DEFAULT  # per-chip budget
    # Explicit opt-in: the measured round-4 go/no-go is negative
    # (time-parallel never beat the serial fused decode on hardware), so
    # the planner only routes here when the caller asks for it.
    prefer_time_parallel: bool = False

    @classmethod
    def from_seqs(cls, seqs, **kw) -> "Workload":
        lens = [len(s) for s in seqs]
        return cls(
            n_seqs=len(lens),
            max_len=max(lens, default=0),
            total_symbols=sum(lens),
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class Route:
    """A scheduling decision: which regime runs this workload and why."""

    kind: str  # batch | dp | tp_chunked | tp_halo | time_parallel | stream_fused | stream_xla
    reason: str
    params: dict = dataclasses.field(default_factory=dict)


def model_resident_bytes(sop: StructuredOperator, emit_num: int) -> int:
    """Device-resident bytes of the structured model (operator components
    + emissions + start vector, f32). The dense [N, N] operators never
    materialize in structured mode, so this is the capacity that must fit
    per chip (or per shard under TP)."""
    n = sop.n
    comps = len(sop.diag_offsets) + len(sop.row_idx) + len(sop.col_idx)
    return 4 * (n * (comps + emit_num + 1) + sop.residual_nnz)


def _mesh_shape(mesh) -> tuple[int, int]:
    """(data shards, state shards) of a mesh; (1, 1) when mesh is None."""
    if mesh is None:
        return 1, 1
    from spec_viterbi_tpu.parallel.mesh import DATA_AXIS, STATE_AXIS

    shape = dict(mesh.shape)
    return shape.get(DATA_AXIS, 1), shape.get(STATE_AXIS, 1)


def plan_route(
    hmm: HMM,
    workload: Workload,
    mesh=None,
    sop: StructuredOperator | None = None,
) -> Route:
    """The decision table as code. Pure: inspects shapes and operator
    structure only, runs nothing."""
    from spec_viterbi_tpu.ops.fused_pallas import fused_eligible
    from spec_viterbi_tpu.ops.time_parallel import time_parallel_supported
    from spec_viterbi_tpu.parallel.fused_tp import fused_tp_supported
    from spec_viterbi_tpu.parallel.structured_tp import structured_tp_supported

    if sop is None:
        sop = StructuredOperator.from_hmm(hmm)
    data_shards, state_shards = _mesh_shape(mesh)

    if workload.streaming:
        if fused_eligible(sop):
            return Route(
                "stream_fused",
                "fused-eligible operator: Pallas streaming engine",
            )
        return Route(
            "stream_xla",
            "irregular operator: universal XLA streaming engine",
        )

    # TP: capacity first (the model MUST shard), then latency.
    resident = model_resident_bytes(sop, hmm.emit_num)
    capacity_bound = resident > workload.hbm_bytes
    latency_bound = (
        workload.optimize == "latency" and sop.n >= TP_LATENCY_STATES
    )
    if state_shards > 1 and (capacity_bound or latency_bound):
        why = (
            f"model arrays ({resident >> 20} MiB) exceed the per-chip "
            f"budget ({workload.hbm_bytes >> 20} MiB)"
            if capacity_bound
            else f"latency-bound at N={sop.n} ≥ {TP_LATENCY_STATES}"
        )
        chunk = TP_CHUNK_DEFAULT
        if fused_tp_supported(sop, state_shards, chunk):
            return Route(
                "tp_chunked",
                f"{why}; banded operator: chunked-halo fused TP "
                f"(2 ppermutes per {chunk}-step chunk)",
                {
                    "chunk": chunk,
                    "shards": state_shards,
                    "capacity_bound": capacity_bound,
                },
            )
        if structured_tp_supported(sop, state_shards):
            return Route(
                "tp_halo",
                f"{why}; coupled operator needs per-step exchange "
                "(64 B/step halo TP, the communication lower bound)",
                {"shards": state_shards, "capacity_bound": capacity_bound},
            )
        # fall through: unshardable operator — DP is still correct
        # (capacity-bound models may simply OOM; surface that in reason)
        return Route(
            "batch" if data_shards <= 1 else "dp",
            f"{why} but the operator fits neither TP schedule "
            f"(n={sop.n} % shards={state_shards}); falling back",
        )

    # Time parallelism: one long sequence leaves ≥127/128 lanes idle, but
    # the round-4 hardware go/no-go (bench_out/time_parallel_go_no_go.json,
    # BASELINE.md) measured compose+fold at 0.29–0.95× of the serial
    # one-lane fused decode at every k — the serial step is already near
    # the VMEM-bandwidth floor, so the compose's R1·k slot work never pays
    # it back. The route stays implemented (and exact), but the scheduler
    # only picks it on explicit request.
    k = TIME_PARALLEL_K_DEFAULT
    tp_dropped = ""
    if workload.prefer_time_parallel:
        if workload.n_seqs != 1:
            tp_dropped = (
                f"; time-parallel request dropped: {workload.n_seqs} "
                "sequences (lanes are better spent on real batch lanes)"
            )
        elif workload.max_len < TIME_PARALLEL_MIN_T:
            tp_dropped = (
                f"; time-parallel request dropped: T={workload.max_len} < "
                f"{TIME_PARALLEL_MIN_T} (dispatch would dominate)"
            )
        elif not time_parallel_supported(sop, k):
            tp_dropped = (
                "; time-parallel request dropped: operator outside the "
                f"banded+low-rank closure at k={k}"
            )
        else:
            return Route(
                "time_parallel",
                f"single {workload.max_len}-symbol sequence, time "
                f"parallelism requested: lanes-as-time-blocks compose+fold "
                f"(k={k}) — note the measured go/no-go is NEGATIVE vs "
                "one-lane serial (BASELINE.md round 4)",
                {"k": k},
            )

    if data_shards > 1:
        return Route(
            "dp",
            f"throughput workload ({workload.n_seqs} seqs): data "
            f"parallelism over {data_shards} devices, zero per-step "
            "collectives" + tp_dropped,
            {"shards": data_shards},
        )
    return Route(
        "batch",
        f"single-device batched decode ({workload.n_seqs} seqs); the "
        "decoder picks fused/structured/dense internally" + tp_dropped,
    )


# ---------------------------------------------------------------------------
# Route execution: dispatch to the owning machinery
# ---------------------------------------------------------------------------


def execute_route(
    hmm: HMM,
    seqs: list[np.ndarray],
    route: Route,
    mesh=None,
    interpret: bool | None = None,
):
    """Run ``seqs`` through ``route``. Returns ``[scores]`` per sequence,
    or ``[(scores, path)]`` when the route was planned with
    ``workload.paths``/carries ``paths`` in params.

    ``interpret``: force Pallas interpret mode (defaults to on when not
    running on TPU — exact but slow; tests use it on the CPU mesh)."""
    import jax

    from spec_viterbi_tpu.models.decoder import ViterbiDecoder

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    paths = bool(route.params.get("paths"))

    if route.kind in ("stream_fused", "stream_xla"):
        raise ValueError(
            "streaming routes are driven incrementally — get the engine "
            "via stream_engine(hmm, route) and use stream_begin/feed"
        )

    if route.kind == "time_parallel":
        from spec_viterbi_tpu.ops.time_parallel import TimeParallelDecoder

        sop = StructuredOperator.from_hmm(hmm)
        tp = TimeParallelDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            k=route.params.get("k", TIME_PARALLEL_K_DEFAULT),
        )
        if paths:
            return [tp.decode_path(s) for s in seqs]
        return [tp.decode(s) for s in seqs]

    if route.kind == "tp_chunked":
        from spec_viterbi_tpu.parallel.fused_tp import FusedTPDecoder

        sop = StructuredOperator.from_hmm(hmm)
        tp = FusedTPDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            mesh,
            chunk=route.params.get("chunk", TP_CHUNK_DEFAULT),
            interpret=interpret,
        )
        return tp.decode_path_batch(seqs) if paths else tp.decode_batch(seqs)

    if route.kind == "tp_halo":
        from spec_viterbi_tpu.parallel.structured_tp import (
            decode_batch_structured_tp,
        )

        if paths:
            # halo TP has no sharded-backpointer path. When the route was
            # chosen for LATENCY the model fits one chip, so rematerialize
            # paths on the unsharded decoder (exact, same oracle); when it
            # was chosen for CAPACITY an unsharded fallback would OOM by
            # the very premise that picked TP — refuse loudly.
            if route.params.get("capacity_bound"):
                raise ValueError(
                    "exact paths are not available under capacity-bound "
                    "halo TP (no state-sharded backpointers for coupled "
                    "operators); decode scores, or stream per time chunk"
                )
            dec = ViterbiDecoder(hmm, use_pallas=False)
            return [dec.decode_path(s) for s in seqs]
        return decode_batch_structured_tp(hmm, seqs, mesh)

    if route.kind == "dp":
        from spec_viterbi_tpu.ops.fused_pallas import (
            FusedStructuredDecoder,
            fused_eligible,
        )
        from spec_viterbi_tpu.parallel.sharded import (
            decode_batch_dp_fused,
            decode_path_batch_dp_fused,
        )

        sop = StructuredOperator.from_hmm(hmm)
        if fused_eligible(sop):
            fd = FusedStructuredDecoder(
                sop,
                hmm.emission_matrix(pad_to=sop.n),
                hmm.start_vector(pad_to=sop.n),
                interpret=interpret,
            )
            if paths:
                return decode_path_batch_dp_fused(fd, seqs, mesh)
            return decode_batch_dp_fused(fd, seqs, mesh)
        if paths:  # irregular operator: per-sequence argmin scan (exact)
            dec = ViterbiDecoder(hmm, use_pallas=False)
            return [dec.decode_path(s) for s in seqs]
        from spec_viterbi_tpu.parallel.structured_tp import (
            decode_batch_structured_dp,
        )

        return decode_batch_structured_dp(hmm, seqs, mesh)

    # "batch": the single-device decoder owns the fused/structured/dense
    # sub-choice (and its own bucketing/backpointer budgets)
    dec = ViterbiDecoder(hmm)
    return dec.decode_path_batch(seqs) if paths else dec.decode_batch(seqs)


def stream_engine(hmm: HMM, route: Route | None = None):
    """The streaming engine a stream_* route names (or plans itself)."""
    from spec_viterbi_tpu.models.decoder import ViterbiDecoder

    if route is not None and route.kind not in ("stream_fused", "stream_xla"):
        raise ValueError(f"not a streaming route: {route.kind}")
    # ViterbiDecoder.streaming() applies the same eligibility split the
    # planner encodes; route only documents the decision
    return ViterbiDecoder(hmm).streaming()


def decode_auto(
    hmm: HMM,
    seqs: list[np.ndarray],
    mesh=None,
    paths: bool = False,
    optimize: str = "throughput",
    verbose: bool = False,
    **workload_kw,
):
    """Plan + execute in one call: ``[(scores, path)]`` or ``[scores]``.

    The one-stop entry for callers that don't want to know route names
    (the scheduler's "Done" criterion). Extra keyword arguments are
    forwarded to :meth:`Workload.from_seqs`, so every planner knob —
    including the ``prefer_time_parallel`` opt-in and ``hbm_bytes`` — is
    reachable from here."""
    if not seqs:
        return []
    workload = Workload.from_seqs(
        seqs, paths=paths, optimize=optimize, **workload_kw
    )
    route = plan_route(hmm, workload, mesh)
    route = Route(route.kind, route.reason, {**route.params, "paths": paths})
    if verbose:
        import sys

        print(f"[scheduler] {route.kind}: {route.reason}", file=sys.stderr)
    return execute_route(hmm, seqs, route, mesh)
