"""TPU roofline audit of the fused kernel (VERDICT r4 #1).

Pins (or breaks) the ~48M sym/s single-chip plateau with MEASURED numbers
instead of round 2's inferred "~7.8 TB/s, near VMEM bandwidth" claim.

Stage 1 — primitive-pass microbenchmarks at the production shape
  ([2432, 128] f32 blocks, 512 lanes, same carry-in-VMEM grid structure as
  the fused kernel). Each variant adds P countable passes of ONE primitive
  class per substep; the least-squares slope over P is the marginal cost
  of that pass, converted to an effective VMEM-stream rate:
    stream : acc = min(acc, buf_k + col_k)        (compulsory 1.24 MB load)
    roll   : acc = min(acc, col_k + roll(v, d_k)) (the diagonal pass)
    colred : min-reduce over states of (col_k + v) (the dense-col pass)
    bcast  : acc = min(acc, col_k + v[s_k])        (the dense-row pass)
    mxu    : acc = min(acc, em @ onehot(sym + k))  (the emission select)

Stage 2 — speed-of-light prediction: the production kernel's substep on
  the 2405-state corpus operator (D=1, R=1, C=2, Z=0) is exactly
  1 roll + 1 bcast + 2 colred + 1 mxu on top of the carry-RMW floor; the
  sum of measured marginal costs + the empty-kernel floor is compared to
  the kernel's measured us/step. Agreement within ~15% pins the plateau.

Stage 3 — falsification experiments:
  (a) bf16 operand arrays (dv/rv/cv/resv/em; f32 carry) — halves streamed
      operand bytes; timed AND drift-checked against the oracle on real
      corpus models (the +-1.0 contract, reference HMM.h:43-49).
  (b) two-symbol composed substep — one carry pass consumes 2 symbols via
      the L2 composed operator (1 Diag + 5 Rank1 for the 2405 model,
      ops/structured_compose); the middle emission makes every slot
      vector symbol-dependent, so the kernel pays 11 MXU gathers + the
      final select per 2 symbols. Timing-shaped: dummy table values, only
      the op mix matters (same methodology as exp_kernel_variants).
  (c) batched emission select — ONE [Np,e]x[e,unroll*BB] MXU dot per grid
      cell instead of `unroll` narrow dots. Bit-identical math, so a win
      here is directly adoptable.

Writes bench_out/roofline.json; prints one JSON line per measurement.
"""

import json
import os
import signal
import sys
import time
from contextlib import contextmanager

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ROOFLINE_SMOKE"):
    # sitecustomize overrides JAX_PLATFORMS; force CPU post-import
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import spec_viterbi_tpu as svt
from spec_viterbi_tpu.ops import fused_pallas as fp
from spec_viterbi_tpu.ops.structured import StructuredOperator

N = 2432  # padded states of the 2405 corpus model
BB = fp.BB  # 128
B = 512
NB = B // BB
T_SUB = 3488  # substeps per micro run (divisible by 2 and 4)
CALLS = 8  # enqueued calls per timed rep (one drain at the end)
REPS = 3
E_PAD = 32

# ROOFLINE_SMOKE=1: tiny shapes + Pallas interpret mode on CPU — validates
# every kernel's tracing/indexing before the TPU queue spends compile time.
SMOKE = bool(os.environ.get("ROOFLINE_SMOKE"))
INTERPRET = SMOKE

RESULTS: dict = {}


@contextmanager
def _deadline(seconds: int = 900):
    def _raise(signum, frame):
        raise TimeoutError(f"cell exceeded {seconds}s")

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def emit(name: str, payload: dict):
    RESULTS[name] = payload
    print(json.dumps({"name": name, **payload}), flush=True)


def _time_calls(enqueue, n_substeps: int) -> float:
    """Median-of-REPS wall time for CALLS enqueued runs -> us/substep.

    `enqueue(i)` must enqueue run i (distinct inputs — the runtime
    memoizes identical computations) and return the output array; ONLY a
    real D2H blocks reliably through the tunnel (CLAUDE.md), so we drain
    once per rep via np.asarray of a 1-element slice.
    """
    np.asarray(enqueue(0)[:1, :1])  # warmup/compile
    times = []
    for r in range(REPS):
        t0 = time.perf_counter()
        outs = [enqueue(r * CALLS + i + 1) for i in range(CALLS)]
        np.asarray(outs[-1][:1, :1])
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[REPS // 2]
    return sec / (CALLS * n_substeps) * 1e6


# ---------------------------------------------------------------- stage 1


def _micro_pallas(kernel, extra_inputs, extra_specs, unroll: int):
    """Standard micro harness: carry [N, B] evolves over grid
    (NB, T_SUB // unroll) with `unroll` substeps per cell."""
    t_cells = T_SUB // unroll

    @jax.jit
    def run(v0, *extras):
        return pl.pallas_call(
            kernel,
            grid=(NB, t_cells),
            in_specs=[
                pl.BlockSpec((N, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                *extra_specs,
            ],
            out_specs=pl.BlockSpec(
                (N, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, B), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=INTERPRET,
        )(v0, *extras)

    rng = np.random.default_rng(0)
    v0s = [
        jax.device_put(rng.normal(5.0, 1.0, size=(N, B)).astype(np.float32))
        for _ in range(REPS * CALLS + 1)
    ]
    extras_d = [jax.device_put(a) for a in extra_inputs]
    return _time_calls(lambda i: run(v0s[i], *extras_d), T_SUB)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, t, _nd=nd: (0,) * _nd, memory_space=pltpu.VMEM)


def micro_empty(unroll: int) -> float:
    def kernel(v0_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        for _ in range(unroll):
            o_ref[:] = o_ref[:] + 0.5

    return _micro_pallas(kernel, [], [], unroll)


def _cols_input(rng):
    return rng.normal(3.0, 1.0, size=(N, 16)).astype(np.float32)


def micro_stream(p: int, unroll: int = 2) -> float:
    rng = np.random.default_rng(1)
    bufs = rng.normal(8.0, 1.0, size=(p, N, BB)).astype(np.float32)
    cols = _cols_input(rng)

    def kernel(v0_ref, bufs_ref, cols_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        for _ in range(unroll):
            v = o_ref[:]
            acc = v + 0.5
            for k in range(p):
                acc = jnp.minimum(acc, bufs_ref[k] + cols_ref[:, k : k + 1])
            o_ref[:] = acc

    return _micro_pallas(
        kernel, [bufs, cols], [_const_spec((p, N, BB)), _const_spec((N, 16))], unroll
    )


def micro_roll(p: int, unroll: int = 2) -> float:
    rng = np.random.default_rng(2)
    cols = _cols_input(rng)

    def kernel(v0_ref, cols_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        for _ in range(unroll):
            v = o_ref[:]
            acc = v + 0.5
            for k in range(p):
                acc = jnp.minimum(
                    acc, cols_ref[:, k : k + 1] + pltpu.roll(v, k % 7 + 1, axis=0)
                )
            o_ref[:] = acc

    return _micro_pallas(kernel, [cols], [_const_spec((N, 16))], unroll)


def micro_colred(p: int, unroll: int = 2) -> float:
    rng = np.random.default_rng(3)
    cols = _cols_input(rng)

    def kernel(v0_ref, cols_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        for _ in range(unroll):
            v = o_ref[:]
            acc = v + 0.5
            extra = None
            for k in range(p):
                cu = jnp.min(cols_ref[:, k : k + 1] + v, axis=0, keepdims=True)
                extra = cu if extra is None else jnp.minimum(extra, cu)
            o_ref[:] = jnp.minimum(acc, extra + 4.0)

    return _micro_pallas(kernel, [cols], [_const_spec((N, 16))], unroll)


def micro_bcast(p: int, unroll: int = 2) -> float:
    rng = np.random.default_rng(4)
    cols = _cols_input(rng)

    def kernel(v0_ref, cols_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        for _ in range(unroll):
            v = o_ref[:]
            acc = v + 0.5
            for k in range(p):
                s = (k * 37) % N
                acc = jnp.minimum(acc, cols_ref[:, k : k + 1] + v[s : s + 1, :])
            o_ref[:] = acc

    return _micro_pallas(kernel, [cols], [_const_spec((N, 16))], unroll)


def micro_mxu(p: int, unroll: int = 2) -> float:
    rng = np.random.default_rng(5)
    em = rng.normal(6.0, 1.0, size=(N, E_PAD)).astype(np.float32)
    t_cells = T_SUB // unroll
    seq = rng.integers(0, 20, size=(t_cells * unroll, 1, B)).astype(np.int32)

    def kernel(v0_ref, em_ref, seq_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (E_PAD, BB), 0)
        for u in range(unroll):
            v = o_ref[:]
            acc = v + 0.5
            for k in range(p):
                oh = (sym_iota == (seq_ref[u] + k) % 20).astype(jnp.float32)
                em_sel = jnp.dot(
                    em_ref[:],
                    oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                acc = jnp.minimum(acc, em_sel)
            o_ref[:] = acc

    seq_spec = pl.BlockSpec(
        (unroll, 1, BB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
    )
    return _micro_pallas(
        kernel, [em, seq], [_const_spec((N, E_PAD)), seq_spec], unroll
    )


def _fit_slope(ps, ts):
    """Least-squares slope of us/substep over pass count."""
    ps = np.asarray(ps, np.float64)
    ts = np.asarray(ts, np.float64)
    return float(np.polyfit(ps, ts, 1)[0])


def stage1() -> dict:
    slopes = {}
    for name, fn, ps in [
        ("stream", micro_stream, (1, 4, 8, 12)),
        ("roll", micro_roll, (1, 4, 8)),
        ("colred", micro_colred, (1, 4, 8)),
        ("bcast", micro_bcast, (1, 4, 8)),
        ("mxu", micro_mxu, (1, 2, 4)),
    ]:
        ts = []
        for p in ps:
            with _deadline():
                us = fn(p)
            ts.append(us)
            emit(f"micro_{name}_p{p}", {"us_per_substep": round(us, 4)})
        slope = _fit_slope(ps, ts)
        block_mb = N * BB * 4 / 1e6
        payload = {"us_per_pass": round(slope, 4)}
        if name in ("stream", "roll"):
            # one compulsory [N, BB] f32 read per pass, NB blocks per
            # substep: MB/us == TB/s of effective per-pass streaming
            payload["eff_tb_per_s"] = round(NB * block_mb / slope, 2)
        emit(f"slope_{name}", payload)
        slopes[name] = slope
    for u in (2, 4):
        with _deadline():
            us = micro_empty(u)
        emit(f"micro_empty_u{u}", {"us_per_substep": round(us, 4)})
        slopes[f"empty_u{u}"] = us
    return slopes


# ---------------------------------------------------------------- stage 2


def _timed_decoder_run(fd, label: str, t: int = 3500) -> float:
    """Time fd's batched decode at [T=3500, B=512] -> us/step; also emits
    M sym/s for comparability with bench.py."""
    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(rng.integers(0, fd.emit_num, size=(t, B)).astype(np.int32))
        for _ in range(REPS * CALLS + 1)
    ]
    lengths = jax.device_put(np.full((1, B), t, np.int32))
    us = _time_calls(
        lambda i: fd._jit_run(batches[i], lengths, masked=False), t - 1
    )
    emit(
        label,
        {"us_per_step": round(us, 4), "msym_per_s": round(B * t / (us * (t - 1)), 2)},
    )
    return us


def stage2(slopes: dict):
    hmm = svt.read_hmm("/root/reference/chmm_files/2405.chmm")
    sop = StructuredOperator.from_hmm(hmm)
    fd = fp.FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    with _deadline():
        measured = _timed_decoder_run(fd, "kernel_baseline")
    predicted = (
        slopes["empty_u4"]
        + slopes["roll"]
        + slopes["bcast"]
        + 2 * slopes["colred"]
        + slopes["mxu"]
    )
    emit(
        "speed_of_light",
        {
            "predicted_us_per_step": round(predicted, 3),
            "measured_us_per_step": round(measured, 3),
            "measured_over_predicted": round(measured / predicted, 3),
            "mix": "empty_u4 + 1*roll + 1*bcast + 2*colred + 1*mxu",
        },
    )
    return fd, hmm, sop, measured


# ------------------------------------------------------------- stage 3a


def _make_bf16_kernel(sop, masked, unroll, t0, *_a, **_kw):
    """The LOSSY all-bf16 arm: bf16 operand refs upcast in-kernel and a
    single hi-only emission dot (8-bit table coverage). Historical record:
    this measured 104 M sym/s but drifted past the +-1.0 contract, which
    led to the exact hi/lo split now in production."""
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = sop.col_idx
    n = sop.n
    residual = list(
        zip(sop.res_src.tolist(), sop.res_dst.tolist(), range(sop.residual_nnz))
    )

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]

        rows = em_ref.shape[1]  # [Np, 2·e_pad] [hi | lo]; hi rows only
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, BB), 0)
        dv = dv_ref[:].astype(jnp.float32)
        rv = rv_ref[:].astype(jnp.float32)
        cv = cv_ref[:].astype(jnp.float32)
        resv = resv_ref[:].astype(jnp.float32)

        for u in range(unroll):
            # unfolded iota: only the hi half can match (symbols < e_pad)
            oh_u = (sym_iota == seq_ref[u]).astype(jnp.bfloat16)
            em_sel = jnp.dot(
                em_ref[:], oh_u, preferred_element_type=jnp.float32
            )
            v = o_ref[:]
            bulk = [
                dv[:, k : k + 1] + pltpu.roll(v, d % n, axis=0)
                for k, d in enumerate(diag_offsets)
            ] + [rv[:, k : k + 1] + v[s : s + 1, :] for k, s in enumerate(row_idx)]
            acc = bulk[0]
            for cand in bulk[1:]:
                acc = jnp.minimum(acc, cand)
            v_new = em_sel + acc
            if masked:
                keep = (t * unroll + u + t0 + 1) < len_ref[:]
                v_new = jnp.where(keep, v_new, v)
            o_ref[:] = v_new

            specials: dict[int, list] = {}
            for k, c in enumerate(col_idx):
                cu = jnp.min(cv[:, k : k + 1] + v, axis=0, keepdims=True)
                specials.setdefault(c, []).append(cu)
            for s, d, k in residual:
                specials.setdefault(d, []).append(resv[0, k] + v[s : s + 1, :])
            for row, cands in specials.items():
                extra = cands[0]
                for cand in cands[1:]:
                    extra = jnp.minimum(extra, cand)
                val = em_sel[row : row + 1, :] + jnp.minimum(
                    acc[row : row + 1, :], extra
                )
                if masked:
                    val = jnp.where(keep, val, v[row : row + 1, :])
                o_ref[row : row + 1, :] = val

    return kernel


def _bf16_decoder(hmm):
    sop = StructuredOperator.from_hmm(hmm)
    fd = fp.FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    fd.dv = fd.dv.astype(jnp.bfloat16)
    fd.rv = fd.rv.astype(jnp.bfloat16)
    fd.cv = fd.cv.astype(jnp.bfloat16)
    fd.resv = fd.resv.astype(jnp.bfloat16)
    fd._col_plan = None  # variants keep the generic per-col/row forms
    fd._row_plan = None
    fd._jit_run = jax.jit(fd._run, static_argnames=("masked", "b_real"))
    return fd


def stage3a(measured_f32: float):
    orig = fp._make_unrolled_kernel
    fp._make_unrolled_kernel = _make_bf16_kernel
    try:
        hmm = svt.read_hmm("/root/reference/chmm_files/2405.chmm")
        fd = _bf16_decoder(hmm)
        with _deadline():
            us = _timed_decoder_run(fd, "bf16_operands")
        # drift check on real corpus sequences, three model sizes
        worst = 0.0
        for name in ("500", "1509", "2405"):
            h = svt.read_hmm(f"/root/reference/chmm_files/{name}.chmm")
            fdh = _bf16_decoder(h)
            seqs = svt.read_emit_seq(
                "/root/reference/ess_files/emit_3_3500_20.ess"
            )[:4]
            st, ln, masked = fdh.prepare(seqs)
            got = np.asarray(
                fdh._jit_run(st, ln, masked=masked, b_real=len(seqs))
            )
            for i, s in enumerate(seqs):
                ref = svt.viterbi_scores_oracle(h, s)
                finite = np.isfinite(ref)
                if not np.array_equal(finite, np.isfinite(got[i])):
                    worst = float("inf")
                else:
                    worst = max(
                        worst, float(np.abs(got[i][finite] - ref[finite]).max())
                    )
        emit(
            "bf16_verdict",
            {
                "speedup_vs_f32": round(measured_f32 / us, 3),
                "max_abs_drift": worst if np.isfinite(worst) else "inf-mismatch",
                "within_contract": bool(worst <= 1.0),
            },
        )
    finally:
        fp._make_unrolled_kernel = orig


# ------------------------------------------------------------- stage 3b


def micro_twosym() -> float:
    """Two-symbol composed substep, timing-shaped. Op mix from the REAL
    L2 compose of the 2405 operator (1 Diag + 5 Rank1, 11 value vectors):
    every vector depends on the middle symbol -> 11 MXU gathers; + diag
    roll, 5 rank1 applies (elementwise add + state reduce + bcast add),
    + the final emission select for the 2nd symbol. 2 symbols per pass."""
    unroll_sym = 4  # symbols per grid cell = 2 composed substeps
    t_cells = T_SUB // unroll_sym
    rng = np.random.default_rng(6)
    tabs = rng.normal(5.0, 1.0, size=(12, N, E_PAD)).astype(np.float32)
    seq = rng.integers(0, 20, size=(t_cells * unroll_sym, 1, B)).astype(np.int32)

    def kernel(v0_ref, tab_ref, seq_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            o_ref[:] = v0_ref[:]

        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (E_PAD, BB), 0)
        for s in range(unroll_sym // 2):
            oh_mid = (sym_iota == seq_ref[2 * s]).astype(jnp.float32)
            oh_end = (sym_iota == seq_ref[2 * s + 1]).astype(jnp.float32)
            v = o_ref[:]

            def gather(j, oh):
                return jnp.dot(
                    tab_ref[j],
                    oh,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            acc = gather(0, oh_mid) + pltpu.roll(v, 2, axis=0)  # composed diag
            for k in range(5):  # rank1: col + min_j(row_j + v_j)
                m = jnp.min(gather(1 + 2 * k, oh_mid) + v, axis=0, keepdims=True)
                acc = jnp.minimum(acc, gather(2 + 2 * k, oh_mid) + m)
            o_ref[:] = gather(11, oh_end) + acc

    seq_spec = pl.BlockSpec(
        (unroll_sym, 1, BB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
    )
    return _micro_pallas(
        kernel, [tabs, seq], [_const_spec((12, N, E_PAD)), seq_spec], unroll_sym
    )


def stage3b(measured_f32: float):
    with _deadline():
        us_per_sym = micro_twosym()  # T_SUB symbols consumed
    emit(
        "twosym_composed",
        {
            "us_per_symbol": round(us_per_sym, 4),
            "msym_per_s": round(B / us_per_sym, 2),
            "speedup_vs_f32": round(measured_f32 / us_per_sym, 3),
        },
    )


# ------------------------------------------------------------- stage 3c


def _make_embatch_kernel(sop, masked, unroll, t0, *_a, **_kw):
    """Production kernel with ONE wide emission dot per grid cell:
    [Np, e] x [e, unroll*BB], then 128-aligned lane slices per substep.
    Bit-identical math to the per-substep dots."""
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = sop.col_idx
    n = sop.n
    residual = list(
        zip(sop.res_src.tolist(), sop.res_dst.tolist(), range(sop.residual_nnz))
    )

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]

        rows = em_ref.shape[1]  # [Np, 2·e_pad] bf16 [hi | lo] split
        e_pad = rows // 2
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, BB), 0)
        sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)
        oh_all = jnp.concatenate(
            [(sym_iota == seq_ref[u]).astype(jnp.bfloat16) for u in range(unroll)],
            axis=1,
        )  # [2·e_pad, unroll*BB]
        em_all = jnp.dot(em_ref[:], oh_all, preferred_element_type=jnp.float32)

        for u in range(unroll):
            em_sel = em_all[:, u * BB : (u + 1) * BB]
            v = o_ref[:]
            bulk = [
                dv_ref[:, k : k + 1] + pltpu.roll(v, d % n, axis=0)
                for k, d in enumerate(diag_offsets)
            ] + [
                rv_ref[:, k : k + 1] + v[s : s + 1, :]
                for k, s in enumerate(row_idx)
            ]
            acc = bulk[0]
            for cand in bulk[1:]:
                acc = jnp.minimum(acc, cand)
            v_new = em_sel + acc
            if masked:
                keep = (t * unroll + u + t0 + 1) < len_ref[:]
                v_new = jnp.where(keep, v_new, v)
            o_ref[:] = v_new

            specials: dict[int, list] = {}
            for k, c in enumerate(col_idx):
                cu = jnp.min(cv_ref[:, k : k + 1] + v, axis=0, keepdims=True)
                specials.setdefault(c, []).append(cu)
            for s, d, k in residual:
                specials.setdefault(d, []).append(resv_ref[0, k] + v[s : s + 1, :])
            for row, cands in specials.items():
                extra = cands[0]
                for cand in cands[1:]:
                    extra = jnp.minimum(extra, cand)
                val = em_sel[row : row + 1, :] + jnp.minimum(
                    acc[row : row + 1, :], extra
                )
                if masked:
                    val = jnp.where(keep, val, v[row : row + 1, :])
                o_ref[row : row + 1, :] = val

    return kernel


def stage3c(measured_f32: float):
    orig = fp._make_unrolled_kernel
    fp._make_unrolled_kernel = _make_embatch_kernel
    try:
        hmm = svt.read_hmm("/root/reference/chmm_files/2405.chmm")
        sop = StructuredOperator.from_hmm(hmm)
        fd = fp.FusedStructuredDecoder(
            sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
        )
        fd._col_plan = None  # variants keep the generic per-col/row forms
        fd._row_plan = None
        with _deadline():
            us = _timed_decoder_run(fd, "embatch_mxu")
        # exact-math check: one real corpus sequence vs the oracle
        seqs = svt.read_emit_seq("/root/reference/ess_files/emit_3_3500_20.ess")[:2]
        st, ln, masked = fd.prepare(seqs)
        got = np.asarray(fd._jit_run(st, ln, masked=masked, b_real=len(seqs)))
        ok = all(
            svt.almost_equal_vec(got[i], svt.viterbi_scores_oracle(hmm, s))
            for i, s in enumerate(seqs)
        )
        emit(
            "embatch_verdict",
            {"speedup_vs_f32": round(measured_f32 / us, 3), "exact_ok": bool(ok)},
        )
    finally:
        fp._make_unrolled_kernel = orig


def smoke():
    """CPU interpret-mode validation of every kernel in this script."""
    global N, B, NB, T_SUB, CALLS, REPS
    N, B, NB, T_SUB, CALLS, REPS = 256, 256, 2, 4, 1, 1
    for name, fn in [
        ("stream", lambda: micro_stream(2)),
        ("roll", lambda: micro_roll(2)),
        ("colred", lambda: micro_colred(2)),
        ("bcast", lambda: micro_bcast(2)),
        ("mxu", lambda: micro_mxu(2)),
        ("empty", lambda: micro_empty(2)),
        ("twosym", micro_twosym),
    ]:
        fn()
        print(f"smoke micro_{name}: OK", flush=True)
    # the two real-kernel variants: decode a corpus model vs the oracle
    hmm = svt.read_hmm("/root/reference/chmm_files/100.chmm")
    sop = StructuredOperator.from_hmm(hmm)
    seq = svt.read_emit_seq("/root/reference/ess_files/emit_3_3500_20.ess")[0][:48]
    ref = svt.viterbi_scores_oracle(hmm, seq)
    orig = fp._make_unrolled_kernel
    for name, factory in [
        ("bf16", _make_bf16_kernel),
        ("embatch", _make_embatch_kernel),
    ]:
        fp._make_unrolled_kernel = factory
        try:
            fd = fp.FusedStructuredDecoder(
                sop,
                hmm.emission_matrix(pad_to=sop.n),
                hmm.start_vector(pad_to=sop.n),
                interpret=True,
            )
            fd._col_plan = None  # variants keep the generic per-col/row forms
            fd._row_plan = None
            if name == "bf16":
                for a in ("dv", "rv", "cv", "resv"):
                    setattr(fd, a, getattr(fd, a).astype(jnp.bfloat16))
                fd._jit_run = jax.jit(fd._run, static_argnames=("masked", "b_real"))
            st, ln, masked = fd.prepare([seq])
            got = np.asarray(fd._jit_run(st, ln, masked=masked, b_real=1))[0]
            assert svt.almost_equal_vec(got, ref), f"{name} drifted past +-1.0"
            print(f"smoke {name}: OK (max drift "
                  f"{np.abs((got - ref)[np.isfinite(ref)]).max():.4g})", flush=True)
        finally:
            fp._make_unrolled_kernel = orig
    print("SMOKE OK", flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if SMOKE:
        smoke()
        return
    slopes = stage1()
    fd, hmm, sop, measured = stage2(slopes)
    del fd, hmm, sop
    stage3a(measured)
    stage3b(measured)
    stage3c(measured)
    os.makedirs("bench_out", exist_ok=True)
    with open("bench_out/roofline.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("ROOFLINE COMPLETE", flush=True)


if __name__ == "__main__":
    main()
