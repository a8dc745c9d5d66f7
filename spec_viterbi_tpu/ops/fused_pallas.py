"""Fused whole-sequence structured Viterbi kernel (Pallas TPU).

The XLA structured path (:mod:`spec_viterbi_tpu.ops.structured`) still pays
per-step dispatch overhead inside `lax.scan` (~tens of µs/step). This kernel
runs the ENTIRE T-step recurrence as one `pallas_call` with the score carry
resident in VMEM:

- grid = (batch_blocks, T−1), time innermost — Mosaic executes the grid
  sequentially, so the output block doubles as the carry and is flushed to
  HBM once per batch block;
- the structured operator (diagonal/row/col vectors) and the emission table
  live in VMEM for the whole decode — the only HBM traffic in the loop is
  the raw int32 observation stream (4 B/step/lane, auto double-buffered by
  the Mosaic pipeline); one-hots are built in-kernel;
- per-step emission selection `em[:, o_t[b]]` is a lane-wise gather, which
  the VPU cannot do — it is instead computed on the **MXU** as
  `em_clamped @ onehot(o_t)`, the one place the systolic array helps a
  (min,+) workload. `+inf` cannot enter a matmul (`inf·0 = NaN`), so the
  emission table is clamped to ``BIG`` and scores ≥ ``BIG_THRESHOLD`` are
  mapped back to `+inf` on extraction — exactly the trick the reference's
  dense backend uses with `FLT_MAX` (``cuASR_helper.cu:147-165``).

MXU precision (the round-5 roofline finding, ``bench_out/roofline.json``):
a ``precision=HIGHEST`` f32 dot costs ~9.7 µs marginal at the production
shape — the single dominant substep term — because Mosaic lowers it as a
6-pass bf16 decomposition. A one-hot selection's PRODUCTS are exact in
any precision (0/1 multipliers, exactly one nonzero accumuland per
column); only the rounding of the emission table itself matters. The
scores kernel therefore selects from an exact bf16 **hi/lo split** of the
f32 table (``hi = bf16(em)``, ``lo = bf16(em − hi)``), folded into ONE
bf16 dot: ``[Np, 2e] = [hi | lo]`` against a doubled one-hot selects both
terms and adds them inside the MXU's f32 accumulator — no separate
`hi@oh + lo@oh` VPU add pass (measured: the extra [Np, B] add pass alone
cost ~4 µs/step, eating most of the win). 16-bit mantissa coverage,
per-step |error| ≤ 2⁻¹⁸·|em| ≈ 1e-4 — corpus-validated within the ±1.0
contract (``HMM.h:43-49``) at T=7000. PATH-producing flows (the path
kernel AND the path-stream forward feeds whose checkpoints it re-runs
from) keep the exact HIGHEST dot: Viterbi DP ties are REAL (equal-cost
paths through small fixtures flipped under the split in
``tests/test_bucketing.py``), and the exact-path contract — bit-identical
to ``viterbi_path_oracle`` — is non-negotiable. Scores-only flows take
the 2× speedup; paths pay the exact dot, which is noise next to their
backpointer-bandwidth cost.

Work per step: ~(3D + 2R + 3C + 3·residual + 2)·N·B VPU ops + two
[N,32]×[32,B] bf16 MXU matmuls — for the Pfam corpus (D=1, R=1, C=2) that
is ~600× less arithmetic than the dense N²·B step.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spec_viterbi_tpu.hmm import MOD_PROB_DTYPE, validate_obs_seq
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.utils.batching import bucket_plan, quantize_t

BB = 128  # batch (lane) block
E_PAD = 32  # minimum one-hot contraction pad; grows in 32s for big alphabets

# Finite stand-in for the semiring zero inside the MXU matmul; scores at or
# beyond BIG_THRESHOLD are +inf semantically (cuASR_helper.cu:157-162 analog).
BIG = np.float32(1e30)
BIG_THRESHOLD = np.float32(1e29)

# Fused kernel eligibility: each residual entry costs a masked row update.
MAX_FUSED_RESIDUAL = 8

# Uniform-column decomposition cap: scalar-row corrections across all cols.
MAX_COL_EXTRAS = 8


def _plan_uniform_cols(sop: StructuredOperator):
    """Collapse near-uniform dense columns into ONE shared masked reduce.

    Profile-HMM columns are almost constant (the whole corpus: col→0 is
    exactly 1.0 on every finite entry; col→flush is 1.0 except a single
    entry), so ``min_j(cv_k[j] + v_j)`` decomposes as
    ``min(c_k + R, scalar corrections)`` with
    ``R = min_{j∈shared}(v_j + mask)`` computed ONCE for all columns.
    This is BIT-exact for the score values: f32 rounding is monotone, so
    ``round(c + min_j v_j) == min_j round(c + v_j)``, and every row
    outside the shared support (another column's deviation, or a support
    difference) contributes through an explicit scalar candidate with its
    true value — the same multiset of candidates as the generic reduce.
    Only the SCORES kernel uses this: the path kernel needs the per-col
    argmin with the oracle's lowest-index tie rule, and a rounded tie
    ``round(c+v_i) == round(c+v_j)`` with ``v_i ≠ v_j`` would resolve by
    value instead of by index under the decomposition.

    Returns ``(mask [n, 1] f32, [(target_row, base, [(j, val), …]), …])``
    or None (no cols / too many corrections → keep the generic reduces).
    """
    if not sop.col_idx:
        return None
    cols = []
    for k in range(len(sop.col_idx)):
        col = sop.col_vals[k]
        fin = np.nonzero(np.isfinite(col))[0]
        if fin.size == 0:
            return None
        vals, counts = np.unique(col[fin], return_counts=True)
        base = float(vals[np.argmax(counts)])
        dev = {int(j): float(col[j]) for j in fin if col[j] != base}
        cols.append((set(fin.tolist()), base, dev, int(sop.col_idx[k])))
    all_dev: set[int] = set()
    for _, _, dev, _ in cols:
        all_dev |= set(dev)
    shared = set.intersection(*(s for s, *_ in cols)) - all_dev
    entries = []
    extras_total = 0
    for support, base, dev, target in cols:
        extras = sorted(dev.items())
        extras += [(j, base) for j in sorted(support - shared - set(dev))]
        extras_total += len(extras)
        entries.append((target, base, extras))
    if extras_total > MAX_COL_EXTRAS:
        return None
    mask = np.full((sop.n, 1), np.inf, np.float32)
    mask[sorted(shared), 0] = 0.0
    return mask, entries


def fused_eligible(sop: StructuredOperator) -> bool:
    return (
        sop.residual_nnz <= MAX_FUSED_RESIDUAL
        and sop.num_components + sop.residual_nnz <= 24
    )


def _plan_uniform_rows(sop: StructuredOperator):
    """Collapse near-uniform dense ROWS into scalar broadcast candidates.

    The corpus's dense row (state 0 → everything) is constant on 99.9+%
    of its support, so the bulk candidate ``rv_k + v[s_k]`` (a full-width
    vector add + min, 2 VPU passes) becomes ``c_k + v[s_k]`` (a [1, B]
    scalar add + one broadcast min). Exactness bookkeeping — the uniform
    candidate now reaches rows it should NOT, so:

    - deviation rows with ``val < c_k`` get an extra specials min with the
      true candidate (the bogus ``c_k + v[s]`` can never undercut it);
    - deviation rows with ``val > c_k`` and real rows OUTSIDE the support
      (the bogus candidate could be spuriously SMALL there) are fully
      recomputed from scalar candidates — the same multiset the generic
      bulk would produce at that row — and override ``acc[row]`` in the
      specials write;
    - padding rows (≥ states_num) receive a finite bogus candidate but
      their per-step emission is ``BIG``, so they stay ≥ BIG_THRESHOLD
      forever and keep mapping to +inf on extraction (they can only feed
      back through +inf-padded operator entries).

    Scores kernel only, like :func:`_plan_uniform_cols` (same tie-rule
    argument). Returns ``(uni, fixes, recompute)`` or None:
      uni       = ((s_k, c_k), …) per row component
      fixes     = ((row, val, s_k), …) extra specials mins
      recompute = ((row, ((dv_val, src), …), ((rv_val, s_m), …)), …)
    """
    if not sop.row_idx or not sop.diag_offsets:
        return None
    uni, fixes = [], []
    recompute_rows: set[int] = set()
    for k, s in enumerate(sop.row_idx):
        row = sop.row_vals[k]
        fin = np.nonzero(np.isfinite(row))[0]
        if fin.size == 0:
            return None
        vals, counts = np.unique(row[fin], return_counts=True)
        base = float(vals[np.argmax(counts)])
        uni.append((int(s), base))
        for j in fin:
            if row[j] != base:
                if row[j] < base:
                    fixes.append((int(j), float(row[j]), int(s)))
                else:
                    recompute_rows.add(int(j))
        recompute_rows |= set(range(sop.states_num)) - set(fin.tolist())
    if len(fixes) + len(recompute_rows) > MAX_COL_EXTRAS:
        return None
    recompute = []
    for r in sorted(recompute_rows):
        dc = tuple(
            (float(sop.diag_vals[k][r]), (r - d) % sop.n)
            for k, d in enumerate(sop.diag_offsets)
            if np.isfinite(sop.diag_vals[k][r])
        )
        rc = tuple(
            (float(sop.row_vals[m][r]), int(sop.row_idx[m]))
            for m in range(len(sop.row_idx))
            if np.isfinite(sop.row_vals[m][r])
        )
        recompute.append((r, dc, rc))
    return tuple(uni), tuple(fixes), tuple(recompute)


def _make_unrolled_kernel(
    sop: StructuredOperator,
    masked: bool,
    unroll: int,
    t0: int,
    exact_em: bool = False,
    col_plan=None,
    row_plan=None,
    exact_parts: int = 1,
):
    """Unrolled kernel: ``unroll`` recurrence steps per grid iteration.

    The observation block is the raw int32 symbol stream ([unroll, 1, B]
    per grid step); one-hots build in-kernel and the MXU selects emissions
    per substep. Grid overhead and the symbol DMA amortize by ``unroll``.
    ``t0`` is the static global step offset (the tail call starts past the
    unrolled main body). ``exact_em``: take the [Np, e_pad] f32 table and
    a precision=HIGHEST dot instead of the bf16 hi/lo split — required
    when this kernel advances carries that a PATH kernel will re-run from
    (see the module docstring's precision note); with ``exact_parts=3``
    the exact flow instead takes the [Np, 3·e_pad] bf16 ``[hi|mid|lo]``
    split whose bit-exactness :func:`_split_em_cat3` PROVED for this
    table — same exactness, one narrow bf16 dot instead of Mosaic's
    6-pass HIGHEST decomposition. ``col_plan``: the
    uniform-column decomposition from :func:`_plan_uniform_cols`'s
    entries — the caller then supplies the shared [n, 1] reduce mask AS
    the ``cv`` input (one masked reduce replaces every per-col reduce,
    bit-exactly; measured 2.5 µs/step per avoided reduce pass).
    """
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = sop.col_idx
    n = sop.n  # pltpu.roll needs non-negative shifts; wrap rows are +inf-baked
    residual = list(
        zip(sop.res_src.tolist(), sop.res_dst.tolist(), range(sop.residual_nnz))
    )

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            # first grid step: seed from v0 (for the tail call this is the
            # main body's output carry)
            o_ref[:] = v0_ref[:]

        # one-hots build in-kernel from the raw int32 symbols (HBM carries
        # 4 bytes/step/lane, not a 32× f32 one-hot tensor), then the MXU
        # does the emission selection. em_ref is the [Np, 2·e_pad] bf16
        # [hi | lo] split of the f32 table: a DOUBLED one-hot (rows o and
        # o+e_pad) makes one bf16 dot select hi and lo and sum them inside
        # the MXU's f32 accumulator — 16-bit mantissa reconstruction at
        # ~1/3 the cost of one precision=HIGHEST dot and zero extra VPU
        # passes (module docstring); exact_em flows get the [Np, e_pad]
        # f32 table + HIGHEST instead
        parts = exact_parts if exact_em else 2
        use_highest = exact_em and parts == 1
        e_pad = em_ref.shape[1] // parts
        rows = em_ref.shape[1]
        # lane width from the seq block (lane-block-width agnostic — wide
        # blocks interleave independent per-block chains, see _pallas)
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, seq_ref.shape[2]), 0)
        for _ in range(parts - 1):  # fold rows o + k·e_pad onto symbol o
            sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)

        for u in range(unroll):
            if use_highest:
                oh_u = (sym_iota == seq_ref[u]).astype(jnp.float32)
                em_sel = jnp.dot(
                    em_ref[:],
                    oh_u,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [Np, B]
            else:
                oh_u = (sym_iota == seq_ref[u]).astype(jnp.bfloat16)
                em_sel = jnp.dot(
                    em_ref[:], oh_u, preferred_element_type=jnp.float32
                )  # [Np, B]
            v = o_ref[:]
            bulk = [
                # d % n: pltpu.roll requires a non-negative shift; the cyclic
                # wrap rows carry +inf in dv, so the wrap never contributes
                dv_ref[:, k : k + 1] + pltpu.roll(v, d % n, axis=0)
                for k, d in enumerate(diag_offsets)
            ]
            if row_plan is not None:
                # uniform dense rows: one [1, B] scalar broadcast each —
                # saves the full-width rv vector add (see _plan_uniform_rows)
                bulk += [c_k + v[s_k : s_k + 1, :] for s_k, c_k in row_plan[0]]
            else:
                bulk += [
                    rv_ref[:, k : k + 1] + v[s : s + 1, :]
                    for k, s in enumerate(row_idx)
                ]
            if bulk:
                acc = bulk[0]
                for cand in bulk[1:]:
                    acc = jnp.minimum(acc, cand)
            else:
                acc = jnp.full(v.shape, jnp.inf, dtype=v.dtype)

            v_new = em_sel + acc
            if masked:
                keep = (t * unroll + u + t0 + 1) < len_ref[:]  # [1, B]
                v_new = jnp.where(keep, v_new, v)
            o_ref[:] = v_new

            specials: dict[int, list] = {}
            if col_plan is not None:
                # shared masked reduce; per-col base shift + scalar fixes
                r_min = jnp.min(cv_ref[:, 0:1] + v, axis=0, keepdims=True)
                for target, base, extras in col_plan:
                    cand = base + r_min
                    for j, val in extras:
                        cand = jnp.minimum(cand, val + v[j : j + 1, :])
                    specials.setdefault(target, []).append(cand)
            else:
                for k, c in enumerate(col_idx):
                    cu = jnp.min(cv_ref[:, k : k + 1] + v, axis=0, keepdims=True)
                    specials.setdefault(c, []).append(cu)
            for s, d, k in residual:
                specials.setdefault(d, []).append(resv_ref[0, k] + v[s : s + 1, :])
            acc_over: dict[int, object] = {}
            if row_plan is not None:
                for row, val, s_k in row_plan[1]:  # true deviation mins
                    specials.setdefault(row, []).append(val + v[s_k : s_k + 1, :])
                for row, dcands, rcands in row_plan[2]:
                    # rows the uniform broadcast may have undercut: rebuild
                    # their bulk from the exact scalar candidate multiset
                    r_acc = None
                    for c_val, src in dcands:
                        cand = c_val + v[src : src + 1, :]
                        r_acc = cand if r_acc is None else jnp.minimum(r_acc, cand)
                    for c_val, s_m in rcands:
                        cand = c_val + v[s_m : s_m + 1, :]
                        r_acc = cand if r_acc is None else jnp.minimum(r_acc, cand)
                    if r_acc is None:
                        r_acc = jnp.full((1, v.shape[1]), jnp.inf, dtype=v.dtype)
                    acc_over[row] = r_acc
                    specials.setdefault(row, [])
            for row, cands in specials.items():
                extra = None
                for cand in cands:
                    extra = cand if extra is None else jnp.minimum(extra, cand)
                base_acc = acc_over.get(row, acc[row : row + 1, :])
                patched = (
                    base_acc if extra is None else jnp.minimum(base_acc, extra)
                )
                val = em_sel[row : row + 1, :] + patched
                if masked:
                    val = jnp.where(keep, val, v[row : row + 1, :])
                o_ref[row : row + 1, :] = val

    return kernel


def _make_fs_kernel(sop: StructuredOperator, unroll: int, col_plan, row_plan, shared):
    """Frame-shifted unmasked scores kernel: zero per-substep rolls.

    The per-substep ``pltpu.roll`` of the [Np, B] carry is a full VPU
    relayout pass (~2.5 µs marginal at Np=2432, ``bench_out/
    roofline.json`` slope_roll). For the single-diagonal operator class
    (the ENTIRE Pfam corpus: one diag at offset 1 + uniform row/col
    plans) the roll commutes with every elementwise op, so the carry can
    live in a ROTATING frame instead: after substep ``u`` the buffer
    holds ``vbuf[i] = v_true[(i + (u+1)·d) mod n]``, which makes the diag
    candidate an ALIGNED add (``dv'[i] + vbuf[i]``) against per-substep
    operand copies pre-rolled at build time (``_fs_operands``) — compile-
    time data movement instead of runtime passes. One realignment roll
    per GRID step (shift ``unroll·d``) restores the true frame, so the
    carry crossing the pallas_call boundary is bit-compatible with every
    other kernel; the roll cost amortizes by ``unroll``.

    The shared column reduce (the other ~2.5 µs pass) is FOLDED into the
    store chain: substep ``u`` computes the running min the NEXT substep
    needs from ``v_new`` while it is in registers (one masked-add + one
    min-accumulate instead of a standalone load+add+reduce pass), with
    the handful of special rows excluded from the bulk mask and min-ed
    back in from their final [1, B] values. Scratch carries the running
    min across grid steps (re-seeded from the incoming carry at t==0).

    Bit-exact vs ``_make_unrolled_kernel``: identical candidate multisets
    and add/round order everywhere — the frame only permutes WHERE values
    sit, and f32 min is exact, so the fold's re-ordered reduce is the
    same value. Asserted array-equal in ``tests/test_fused.py``.
    Unmasked only (a frozen lane would be stranded in a stale frame);
    ``prepare`` compiles the mask out for uniform-length batches, which
    is exactly the headline serving shape.
    """
    n = sop.n
    d = sop.diag_offsets[0] % n

    def kernel(v0_ref, dv_ref, em_ref, mask0_ref, excl_ref, seq_ref, o_ref, rmin_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]
            # seed the running shared-column min from the incoming carry
            # (true frame) — same values the base kernel's per-substep
            # reduce would compute at its first step
            rmin_ref[:] = jnp.min(
                mask0_ref[:] + v0_ref[:], axis=0, keepdims=True
            )

        rows2 = em_ref.shape[2]  # 2·e_pad ([hi | lo] split)
        e_pad = rows2 // 2
        # lane width from the seq block: the FS kernel is lane-block-width
        # agnostic (wider blocks give Mosaic independent per-block chains
        # to interleave — see _pallas_fs lane_block)
        lb = seq_ref.shape[2]
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows2, lb), 0)
        sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)

        r_min = rmin_ref[:]
        for u in range(unroll):
            phi_in = (u * d) % n  # carry frame entering this substep
            phi_out = ((u + 1) * d) % n  # frame of v_new / this substep's writes
            oh_u = (sym_iota == seq_ref[u]).astype(jnp.bfloat16)
            em_sel = jnp.dot(
                em_ref[u], oh_u, preferred_element_type=jnp.float32
            )  # [Np, B], table pre-rolled to phi_out
            v = o_ref[:]
            # diag candidate is ALIGNED in the rotating frame; uniform
            # dense rows stay scalar broadcasts (shifted source index)
            acc = dv_ref[u] + v
            for s_k, c_k in row_plan[0]:
                sb = (s_k - phi_in) % n
                acc = jnp.minimum(acc, c_k + v[sb : sb + 1, :])
            v_new = em_sel + acc
            o_ref[:] = v_new

            # specials: same candidate multiset as the base kernel, with
            # every static state index mapped into the current frame
            specials: dict[int, list] = {}
            for target, base, extras in col_plan:
                cand = base + r_min
                for j, val in extras:
                    jb = (j - phi_in) % n
                    cand = jnp.minimum(cand, val + v[jb : jb + 1, :])
                specials.setdefault(target, []).append(cand)
            for row, val, s_k in row_plan[1]:
                sb = (s_k - phi_in) % n
                specials.setdefault(row, []).append(val + v[sb : sb + 1, :])
            acc_over: dict[int, object] = {}
            for row, dcands, rcands in row_plan[2]:
                r_acc = None
                for c_val, src in dcands:
                    sb = (src - phi_in) % n
                    cand = c_val + v[sb : sb + 1, :]
                    r_acc = cand if r_acc is None else jnp.minimum(r_acc, cand)
                for c_val, s_m in rcands:
                    sb = (s_m - phi_in) % n
                    cand = c_val + v[sb : sb + 1, :]
                    r_acc = cand if r_acc is None else jnp.minimum(r_acc, cand)
                if r_acc is None:
                    r_acc = jnp.full((1, v.shape[1]), jnp.inf, dtype=v.dtype)
                acc_over[row] = r_acc
                specials.setdefault(row, [])

            # folded reduce: bulk rows while v_new is live …
            r_next = jnp.min(excl_ref[u] + v_new, axis=0, keepdims=True)
            for row, cands in specials.items():
                rb = (row - phi_out) % n
                extra = None
                for cand in cands:
                    extra = cand if extra is None else jnp.minimum(extra, cand)
                base_acc = acc_over.get(row, acc[rb : rb + 1, :])
                patched = (
                    base_acc if extra is None else jnp.minimum(base_acc, extra)
                )
                val = em_sel[rb : rb + 1, :] + patched
                o_ref[rb : rb + 1, :] = val
                # … special rows contribute their FINAL values
                if row in shared:
                    r_next = jnp.minimum(r_next, val)
            r_min = r_next

        rmin_ref[:] = r_min
        phi_fin = (unroll * d) % n
        if phi_fin:  # one realign roll per grid step (vs one per substep)
            o_ref[:] = pltpu.roll(o_ref[:], phi_fin, axis=0)

    return kernel


def _make_path_kernel(sop: StructuredOperator, masked: bool, em_parts: int = 1):
    """Score+backpointer kernel: tracks (value, source-state) pairs.

    Tie-breaking is the framework contract — globally lowest source index,
    with inf==inf ties never adopting a candidate — so emitted paths are
    bit-identical to the NumPy oracle's. Each step stores the winning
    source per state as int16 (states ≤ 32767); backtrace is then a cheap
    per-lane gather scan outside the kernel. Frozen (masked) steps store
    identity pointers so backtrace through padding is a no-op.

    ``em_parts=3``: select from the [Np, 3·e_pad] bf16 ``[hi|mid|lo]``
    table whose bit-exact reconstruction :func:`_split_em_cat3` proved —
    identical carries/ties to the ``precision=HIGHEST`` f32 dot
    (``em_parts=1``) at a fraction of its 6-pass MXU cost.
    """
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = sop.col_idx
    n = sop.n  # pltpu.roll needs non-negative shifts; wrap rows are +inf-baked
    residual = list(
        zip(sop.res_src.tolist(), sop.res_dst.tolist(), range(sop.residual_nnz))
    )

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref, src_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]

        v = o_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)

        def take(u, src, cand, cand_src):
            # "semantically infinite" covers both true +inf and the BIG
            # range the MXU clamp produces; such ties never adopt a source,
            # matching the oracle's all-inf-row -> pointer 0 behavior
            better = (cand < u) | (
                (cand == u) & (cand_src < src) & (cand < BIG_THRESHOLD)
            )
            return jnp.where(better, cand, u), jnp.where(better, cand_src, src)

        u = src = None
        for k, d in enumerate(diag_offsets):
            cand = dv_ref[:, k : k + 1] + pltpu.roll(v, d % n, axis=0)
            cand_src = rows - d
            if u is None:
                u = cand
                src = jnp.where(cand < BIG_THRESHOLD, cand_src, jnp.int32(2**30))
            else:
                u, src = take(u, src, cand, cand_src)
        for k, s in enumerate(row_idx):
            cand = rv_ref[:, k : k + 1] + v[s : s + 1, :]
            cand_src = jnp.full(v.shape, s, jnp.int32)
            if u is None:
                u = cand
                src = jnp.where(cand < BIG_THRESHOLD, cand_src, jnp.int32(2**30))
            else:
                u, src = take(u, src, cand, cand_src)
        if u is None:
            u = jnp.full(v.shape, jnp.inf, dtype=v.dtype)
            src = jnp.full(v.shape, 2**30, jnp.int32)

        # EXACT selection (NOT the scores kernel's 16-bit hi/lo split):
        # equal-cost Viterbi ties are real, and the tie-break contract —
        # paths bit-identical to viterbi_path_oracle — requires carries
        # that accumulate exactly like the oracle's. Exactness comes from
        # either the HIGHEST f32 dot or the proved bf16 [hi|mid|lo] split.
        e_pad = em_ref.shape[1] // em_parts
        # lane width from the seq block (lane-block-width agnostic — wide
        # blocks interleave independent per-block chains, see _path_pallas)
        sym_iota = jax.lax.broadcasted_iota(
            jnp.int32, (em_ref.shape[1], seq_ref.shape[2]), 0
        )
        for _ in range(em_parts - 1):  # fold rows o + k·e_pad onto symbol o
            sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)
        if em_parts == 1:
            oh = (sym_iota == seq_ref[0]).astype(jnp.float32)  # [e_pad, B]
            em_sel = jnp.dot(
                em_ref[:],
                oh,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            oh = (sym_iota == seq_ref[0]).astype(jnp.bfloat16)
            em_sel = jnp.dot(em_ref[:], oh, preferred_element_type=jnp.float32)
        v_new = em_sel + u
        src_out = jnp.where((src == 2**30) | (u >= BIG_THRESHOLD), 0, src)
        if masked:
            keep = (t + 1) < len_ref[:]  # [1, B]
            v_new = jnp.where(keep, v_new, v)
            src_out = jnp.where(keep, src_out, rows)  # identity pointer
        o_ref[:] = v_new
        src_ref[0] = src_out.astype(jnp.int16)

        # single-row patches: dense cols (with their own argmin) + residual
        specials: dict[int, list] = {}
        for k, c in enumerate(col_idx):
            s_full = cv_ref[:, k : k + 1] + v  # [Np, B]
            cu = jnp.min(s_full, axis=0, keepdims=True)
            cs = jnp.argmin(s_full, axis=0).astype(jnp.int32)[None, :]
            specials.setdefault(c, []).append((cu, cs))
        for s, d, k in residual:
            cand = resv_ref[0, k] + v[s : s + 1, :]
            specials.setdefault(d, []).append(
                (cand, jnp.full(cand.shape, s, jnp.int32))
            )
        for row, cands in specials.items():
            pu, ps = u[row : row + 1, :], src[row : row + 1, :]
            for cu, cs in cands:
                better = (cu < pu) | ((cu == pu) & (cs < ps) & (cu < BIG_THRESHOLD))
                pu = jnp.where(better, cu, pu)
                ps = jnp.where(better, cs, ps)
            val = em_sel[row : row + 1, :] + pu
            ps = jnp.where((ps == 2**30) | (pu >= BIG_THRESHOLD), 0, ps)
            if masked:
                val = jnp.where(keep, val, v[row : row + 1, :])
                ps = jnp.where(keep, ps, row)
            o_ref[row : row + 1, :] = val
            src_ref[0, row : row + 1, :] = ps.astype(jnp.int16)

    return kernel


def _split_em_cat(em_pad: np.ndarray) -> np.ndarray:
    """[Np, e] f32 → [Np, 2e] bf16 ``[hi | lo]`` with hi + lo == em to 16
    mantissa bits (the scores kernel's exact-split emission table)."""
    em_hi = em_pad.astype(jnp.bfloat16)
    em_lo = (em_pad - np.asarray(em_hi, np.float32)).astype(jnp.bfloat16)
    return np.concatenate([np.asarray(em_hi), np.asarray(em_lo)], axis=1)


def _split_em_cat3(em_pad: np.ndarray):
    """[Np, e] f32 → ([Np, 3e] bf16 ``[hi | mid | lo]``, proved_exact).

    Three successive bf16 residuals cover f32's full 24-bit mantissa, so a
    TRIPLED one-hot selection reconstructs the f32 table entry EXACTLY —
    this is the ``Precision.HIGH`` (bf16x3) emulation, legal here because
    a one-hot dot has no cross-products (the general case needs 6 passes;
    Mosaic refuses to lower HIGH itself). Exactness is PROVED on the host
    against this specific table: the MXU's f32 accumulator may add the
    three selected products in any order (zeros interleave freely), so we
    require every partial sum it could form — each pair and the total —
    to be exactly representable in f32 (float64 cross-check). The parts
    are extracted by TRUNCATION, not round-to-nearest: RN residuals can
    leave hi+lo spanning 25 bits (a carry pushes hi past x's exponent —
    observed on random tables), while truncation gives each part a
    disjoint 8-bit range of the 24-bit mantissa, so every partial sum is
    a bit-masked piece of x and representable in ANY order. If an entry
    still fails (subnormal corners), the caller falls back to the
    ``precision=HIGHEST`` f32 dot (~3.5× the MXU cost at the production
    shape)."""

    def trunc(x):  # f32 → nearest bf16-representable value toward zero
        return (x.view(np.uint32) & np.uint32(0xFFFF0000)).view(np.float32)

    hi_f = trunc(em_pad)
    r1 = em_pad - hi_f
    mid_f = trunc(r1)
    r2 = r1 - mid_f
    hi = hi_f.astype(jnp.bfloat16)  # exact: values are bf16-representable
    mid = mid_f.astype(jnp.bfloat16)
    lo = trunc(r2).astype(jnp.bfloat16)
    h, m, l = (np.asarray(x, np.float32) for x in (hi, mid, lo))
    h64, m64, l64 = (x.astype(np.float64) for x in (h, m, l))
    pairs_exact = all(
        np.array_equal((a + b).astype(np.float64), a64 + b64)
        for (a, b, a64, b64) in (
            (h, m, h64, m64),
            (h, l, h64, l64),
            (m, l, m64, l64),
        )
    )
    totals_exact = all(
        np.array_equal(total, em_pad)
        for total in ((h + m) + l, (h + l) + m, (m + l) + h)
    )
    em3 = np.concatenate([np.asarray(hi), np.asarray(mid), np.asarray(lo)], axis=1)
    return em3, bool(pairs_exact and totals_exact)


def _quantize_total(n: int) -> int:
    """Quantized concatenated-stream length (bounds compiled shapes)."""
    return quantize_t(max(n, 1))


@functools.partial(jax.jit, static_argnames=("t_total",))
def _expand_symbols(flat, off, last, t_total: int):
    """Device-side ragged→rectangular expansion: ``[T, B]`` from the
    concatenated symbol stream.

    ``out[t, b] = flat[min(off[b] + t, last[b])]`` — time padding repeats
    each lane's final symbol (value irrelevant: padded steps are masked or
    belong to sliced-off lanes). The host ships only the real symbols:
    through a slow host↔device link this is the difference between
    O(Σ len) and O(B · max len) transfer for ragged batches (7× on the
    covid-19 profile, whose max/mean length ratio is ~7).
    """
    t_iota = jnp.arange(t_total, dtype=jnp.int32)[:, None]
    idx = jnp.minimum(off[None, :] + t_iota, last[None, :])
    # flat may arrive int8 (narrow upload); widen after the gather
    return jnp.take(flat, idx).astype(jnp.int32)


def _backtrace_kernel(src_ref, last_ref, path_ref, state_ref):
    """Reverse path walk: one grid step per (reversed) time step.

    The per-lane gather ``src[state[b], b]`` has no VPU primitive; it is
    computed as a one-hot select: mask rows where ``iota == state`` and
    min-reduce over states (exactly one row survives). The running state
    vector persists across grid steps in VMEM scratch.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        state_ref[:] = last_ref[:]

    state = state_ref[:]  # [1, B] int32
    rows = jax.lax.broadcasted_iota(jnp.int32, src_ref.shape[1:], 0)  # [Np, B]
    sel = jnp.where(rows == state, src_ref[0].astype(jnp.int32), 2**30)
    prev = jnp.min(sel, axis=0, keepdims=True)  # [1, B]
    state_ref[:] = prev
    path_ref[0] = prev


class StreamState(NamedTuple):
    """Resumable streaming-decode state: device carry + real lane count."""

    carry: "jax.Array"  # [Np, B_pad], BIG-clamped score space
    b_real: int


class StreamChunk(NamedTuple):
    """One retained chunk: the staged device symbols (already quantized +
    lane-padded — reused verbatim by the finalize re-run, so finalize does
    ZERO host→device transfer) and the real step count."""

    syms: "jax.Array"  # [T_q, B_pad] narrow-dtype device symbols
    lengths: "jax.Array"  # [1, B_pad] int32 per-lane (valid_i + 1)
    t_c: int


class PathStreamState(NamedTuple):
    """Streaming exact-path state: carry + per-chunk checkpoints.

    ``checkpoints[k]`` is the device carry at chunk ``k``'s start (O(Np·B)
    each); ``chunks[k]`` is the chunk's :class:`StreamChunk` (symbols stay
    device-resident — ~0.2 MB/chunk at int8, smaller than the checkpoint;
    the device never holds more than one chunk's [T_c, Np, B] bp
    tensor)."""

    carry: "jax.Array"  # [Np, B_pad]
    b_real: int
    checkpoints: tuple  # tuple of [Np, B_pad] device carries
    chunks: tuple  # tuple of StreamChunk


def _run_path_finalize(state: "PathStreamState", extract, last, block, fetch=np.asarray):
    """Shared checkpoint-rematerialize finalize protocol (single-chip and
    DP-sharded): ENQUEUE the score extract, the boundary argmin, and every
    reverse path block back-to-back, then drain once — per-block host
    blocking would add one ~25 ms tunnel round trip per chunk, and the
    chunk symbols are already device-resident (StreamChunk) so there is
    zero H2D here.

    ``block(ckpt, syms_dev, lengths_dev, boundary) → (piece, boundary)``.
    ``fetch``: host-transfer hook — ``np.asarray`` single-chip; the
    DP-sharded stream passes ``fetch_global`` so finalize works when the
    mesh spans a multi-host process group.
    """
    scores_d = extract(state.carry)
    boundary = last(state.carry)
    pieces = []
    for rec, ckpt in zip(reversed(state.chunks), reversed(state.checkpoints)):
        piece, boundary = block(ckpt, rec.syms, rec.lengths, boundary)
        pieces.append((piece, rec.t_c))
    # ---- single drain of everything enqueued above ----
    # (a device-side concat of the pieces before one D2H was measured
    # SLOWER here — the eager slice/concat dispatches through the tunnel
    # cost more than the per-piece drains they replace: 5.5 s vs 4.7 s
    # finalize at T=100k/33 chunks)
    first = fetch(boundary)[:, : state.b_real]  # states at position 0
    path = np.concatenate(
        [
            first,
            *[
                fetch(p)[:t_c, : state.b_real].astype(np.int32)
                for p, t_c in reversed(pieces)
            ],
        ],
        axis=0,
    )  # [T_total, B]
    return fetch(scores_d)[: state.b_real], path.T


class _StreamAPI:
    """The streaming-decode protocol, shared by every stream engine.

    ``stream_begin/feed/scores`` (constant-memory scores over unbounded
    input), the ``stream_*_path`` family (exact paths via checkpoint +
    rematerialize), and ``stream_save/load`` persistence. Engines provide
    the compute hooks (``_jit_begin``, ``_jit_feed``, ``_jit_extract``,
    ``_jit_last``, ``_jit_path_block``), plus ``emit_num``/``n``/
    ``_sym_dtype``/``_model_key``/``path_supported``. Two engines exist:
    the fused Pallas kernel (:class:`FusedStructuredDecoder`, the TPU fast
    path) and the XLA structured fallback
    (:class:`~spec_viterbi_tpu.models.streaming_xla.XLAStreamDecoder`,
    which accepts ANY operator) — keeping the protocol in one place means
    the long-context API can never be narrower than the parity decode API
    (``Viterbi_impl.h:8`` takes whole sequences; streaming is the
    extension).
    """

    def stream_begin(self, first_symbols: np.ndarray) -> "StreamState":
        """[B] first symbols → streaming state (device carry [Np, B_pad])."""
        syms = validate_obs_seq(first_symbols, self.emit_num)
        if len(syms) == 0:
            raise ValueError("cannot stream an empty lane set")
        return StreamState(self._jit_begin(jnp.asarray(syms)), len(syms))

    def stream_feed(
        self, state: "StreamState", chunk: np.ndarray, valid=None
    ) -> "StreamState":
        """Advance the carry by a [T_c, B] block of symbols.

        ``valid`` (optional, [B] ints): per-lane count of REAL symbols in
        this chunk — lane ``i`` advances by ``valid[i]`` steps and then
        freezes (a finished lane passes 0 and its scores stay fixed), so
        ragged lanes can share one stream exactly like the batch API's
        per-lane masking (round 3 required uniform lanes — the streaming
        extension must not be narrower than the parity decode API,
        ``Viterbi_impl.h:8``; VERDICT r3 #6). Omitted = all lanes take
        the full chunk. Symbols past a lane's valid count must still be
        in-alphabet (pad with 0); they are masked off, never decoded.

        The chunk is padded to the ``quantize_t`` length grid and run with
        the masked step (padding steps freeze the carry — bit-identical
        to the unpadded run), so arbitrary arriving chunk sizes compile at
        most ~2 program shapes per octave instead of one per distinct
        ``T_c`` (a fresh shape is a 30-200 s remote compile on a tunneled
        deployment)."""
        prep = self._prep_stream_chunk(state.carry, state.b_real, chunk, valid)
        if prep is None:
            return state
        chunk, t_c, valid = prep
        return StreamState(
            self._feed_quantized(state.carry, chunk, t_c, valid), state.b_real
        )

    def _prep_stream_chunk(self, carry, b_real: int, chunk, valid=None):
        """Validate + lane-pad a streaming chunk →
        ([T_c, B_pad], t_c, valid [B_pad] | None)."""
        chunk = np.asarray(chunk, dtype=np.int32)
        if chunk.ndim != 2 or chunk.shape[1] != b_real:
            raise ValueError(f"chunk must be [T_c, {b_real}], got {chunk.shape}")
        t_c = chunk.shape[0]
        if t_c == 0:
            return None
        validate_obs_seq(chunk.reshape(-1), self.emit_num)
        b_pad = carry.shape[1]
        if b_pad != chunk.shape[1]:  # padding lanes see symbol 0 — discarded
            chunk = np.pad(chunk, ((0, 0), (0, b_pad - chunk.shape[1])))
        if valid is not None:
            valid = np.asarray(valid, dtype=np.int32)
            if valid.shape != (b_real,):
                raise ValueError(f"valid must be [{b_real}], got {valid.shape}")
            if (valid < 0).any() or (valid > t_c).any():
                raise ValueError(f"valid counts must be in [0, {t_c}]")
            valid = np.pad(valid, (0, b_pad - b_real))  # pad lanes freeze
        return chunk, t_c, valid

    def _stage_quantized(self, chunk, t_c: int, put=None, valid=None):
        """T-quantize + narrow-upload a lane-padded [t_c, B_pad] chunk →
        (syms_dev, lengths_dev). THE one copy of the chunk-staging
        protocol (scores stream, path stream, and the DP-sharded stream
        via its ``put`` placement hook all use it).

        The masked keep-condition is (step + 1) < lengths (the batch
        path's obs starts at symbol 1); chunk steps are absolute, so
        lane length ``valid_i + 1`` (``t_c + 1`` uniform) applies exactly
        steps 0..valid_i-1 and freezes the rest — per-lane raggedness and
        the quantization pad ride the same mask."""
        from spec_viterbi_tpu.utils.batching import quantize_t

        t_q = quantize_t(t_c)
        if t_q != t_c:  # padding steps are masked off via lengths
            chunk = np.pad(chunk, ((0, t_q - t_c), (0, 0)))
        if valid is None:
            lengths = np.full((1, chunk.shape[1]), t_c + 1, np.int32)
        else:
            lengths = (valid + 1).astype(np.int32)[None, :]
        syms = chunk.astype(self._sym_dtype)
        if put is None:
            return jnp.asarray(syms), jnp.asarray(lengths)
        return put(syms), put(lengths)

    def _feed_quantized(self, carry, chunk, t_c: int, valid=None):
        """Advance the carry by a lane-padded [t_c, B_pad] chunk."""
        syms_d, lengths_d = self._stage_quantized(chunk, t_c, valid=valid)
        return self._jit_feed(carry, syms_d, lengths_d)

    def stream_scores(self, state: "StreamState") -> np.ndarray:
        """Extract current [B, Np] score vectors (+inf restored); the
        state stays valid — peeking mid-stream is allowed."""
        return np.asarray(self._jit_extract(state.carry, b_real=state.b_real))

    # ---- streaming EXACT-PATH decode: checkpoint + rematerialize ----
    #
    # Exact full-path output needs every step's backpointer, but one
    # device-resident [T, Np, B] pointer tensor caps T at the HBM budget.
    # Streaming instead checkpoints the O(Np·B) carry at each chunk
    # boundary during the forward pass (scores math only — no
    # backpointers), then ``finalize`` re-runs the pointer-producing pass
    # one chunk at a time in REVERSE, backtracing across chunk boundaries.
    # Device memory stays O(chunk) regardless of total length; total
    # device work is 2× the forward pass — the jax.checkpoint/
    # rematerialization trade applied to Viterbi backtrace. No reference
    # analog (the reference has no backtrace at all, Viterbi_impl.h:8-9);
    # paths are bit-identical to the one-shot path decode and the NumPy
    # oracle.

    def _check_path_stream(self) -> None:
        """Engine veto hook for path streaming (pointer-dtype limits)."""

    @property
    def _feed_path_fn(self):
        """Forward feed used by PATH streaming. Engines whose path kernel
        accumulates differently from the scores kernel (the fused engine's
        exact-vs-split emission dots) override via ``_jit_feed_path`` so
        checkpoints match the finalize re-runs bit-for-bit."""
        return getattr(self, "_jit_feed_path", None) or self._jit_feed

    def stream_begin_path(self, first_symbols: np.ndarray) -> "PathStreamState":
        """[B] first symbols → path-streaming state."""
        self._check_path_stream()
        syms = validate_obs_seq(first_symbols, self.emit_num)
        if len(syms) == 0:
            raise ValueError("cannot stream an empty lane set")
        return PathStreamState(self._jit_begin(jnp.asarray(syms)), len(syms), (), ())

    def stream_feed_path(
        self, state: "PathStreamState", chunk: np.ndarray, valid=None
    ) -> "PathStreamState":
        """Advance by a [T_c, B] block, checkpointing the pre-chunk carry.

        ``valid``: per-lane real-symbol counts as in :meth:`stream_feed`
        — frozen steps store identity pointers during finalize, so a
        ragged lane's path repeats its end state past its true length
        (the caller slices to ``1 + Σ valid``, exactly like the batch
        path API's padding contract).

        The forward pass runs the cheap scores step (identical carry
        math to the pointer pass); backpointers for this chunk only
        materialize during ``stream_path_finalize``. The chunk's quantized
        length must fit the single-call backpointer budget
        (``path_supported``) since finalize re-runs it as one call."""
        from spec_viterbi_tpu.utils.batching import quantize_t

        prep = self._prep_stream_chunk(state.carry, state.b_real, chunk, valid)
        if prep is None:
            return state
        chunk, t_c, valid = prep
        b_pad = chunk.shape[1]
        t_q = quantize_t(t_c)
        if not self.path_supported(t_q + 1, batch=b_pad):
            raise ValueError(
                f"path chunk of {t_c} symbols ({t_q} quantized) exceeds the "
                f"backpointer budget at {b_pad} lanes; feed smaller chunks"
            )
        syms_d, lengths_d = self._stage_quantized(chunk, t_c, valid=valid)
        return PathStreamState(
            self._feed_path_fn(state.carry, syms_d, lengths_d),
            state.b_real,
            state.checkpoints + (state.carry,),
            state.chunks + (StreamChunk(syms_d, lengths_d, t_c),),
        )

    def stream_path_scores(self, state: "PathStreamState") -> np.ndarray:
        """Current [B, Np] scores (peeking is allowed; state stays valid)."""
        return np.asarray(self._jit_extract(state.carry, b_real=state.b_real))

    def stream_path_finalize(
        self, state: "PathStreamState"
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ (scores [B, Np], paths [B, T_total]), T_total = 1 + Σ chunk.

        Re-runs the pointer pass per chunk in reverse order; the state is
        not consumed — feeding may continue afterwards."""
        return _run_path_finalize(
            state,
            lambda c: self._jit_extract(c, b_real=state.b_real),
            self._jit_last,
            lambda ck, ch, ln, bd: self._jit_path_block(
                ck, ch, ln, bd, b_real=state.b_real
            ),
        )

    # ---- stream-state persistence (checkpoint/resume across processes) --
    #
    # The carry IS the whole forward state, so a stream survives process
    # restarts by writing it to disk — the streaming analog of the
    # operator cache (SURVEY.md §5 checkpoint/resume; the reference
    # rebuilds everything from scratch every run).

    def stream_save(self, state, path: str) -> None:
        """Persist a StreamState or PathStreamState to ``path`` (.npz)."""
        payload = {
            "carry": np.asarray(state.carry),
            "b_real": np.int64(state.b_real),
            "model_key": np.bytes_(self._model_key.encode()),
        }
        if isinstance(state, PathStreamState):
            payload["n_chunks"] = np.int64(len(state.chunks))
            for k, (ck, rec) in enumerate(zip(state.checkpoints, state.chunks)):
                payload[f"ckpt_{k}"] = np.asarray(ck)
                payload[f"chunk_{k}"] = np.asarray(rec.syms)
                payload[f"tc_{k}"] = np.int64(rec.t_c)
                # per-lane lengths (ragged chunks): finalize re-runs with
                # the exact mask the forward pass used
                payload[f"len_{k}"] = np.asarray(rec.lengths)
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)  # atomic publish

    def stream_load(self, path: str):
        """Load a stream state saved by :meth:`stream_save`; resumes
        bit-identically (the carry is the complete forward state)."""
        with np.load(path) as z:
            if bytes(z["model_key"]).decode() != self._model_key:
                raise ValueError(
                    "stream state was saved for a different model/decoder"
                )
            carry = jnp.asarray(z["carry"])
            b_real = int(z["b_real"])
            if "n_chunks" not in z:
                return StreamState(carry, b_real)
            n_chunks = int(z["n_chunks"])
            ckpts = tuple(jnp.asarray(z[f"ckpt_{k}"]) for k in range(n_chunks))
            b_pad = carry.shape[1]
            chunks = []
            for k in range(n_chunks):
                t_c = int(z[f"tc_{k}"])
                if f"len_{k}" in z:
                    lengths = jnp.asarray(z[f"len_{k}"])
                else:  # pre-ragged save format: uniform lanes
                    lengths = jnp.full((1, b_pad), t_c + 1, jnp.int32)
                chunks.append(
                    StreamChunk(jnp.asarray(z[f"chunk_{k}"]), lengths, t_c)
                )
            return PathStreamState(carry, b_real, ckpts, tuple(chunks))


class FusedStructuredDecoder(_StreamAPI):
    """Whole-sequence fused decoder for one HMM (batched, scores only)."""

    def __init__(
        self,
        sop: StructuredOperator,
        emissions: np.ndarray,
        pi: np.ndarray,
        interpret: bool = False,
        unroll: int | None = None,
    ):
        # Unrolling amortizes grid overhead and batches the MXU one-hot
        # dot. ``unroll=None`` (default) adapts to the call's lane width
        # (``_plan_for``); an explicit int pins that depth exactly —
        # the experiment scripts rely on the pin meaning what it says.
        # unroll=4 needs the raised scoped-VMEM limit (its ~17.4 MB
        # working set at Np≈2432 exceeds Mosaic's 16 MB default — see the
        # compiler_params note in _pallas) and measured fastest on the
        # 2405 corpus at b=512: 46.1M sym/s vs 43.9M (u2) / 41.7M (u5) /
        # 40.0M (u7) in one session — deeper unrolls spill.
        self.interpret = interpret
        self.unroll = unroll
        if not fused_eligible(sop):
            raise ValueError(
                f"operator too irregular for the fused kernel "
                f"(components={sop.num_components}, residual={sop.residual_nnz})"
            )
        self.sop = sop
        n = sop.n
        self.n = n
        self.states_num = sop.states_num
        self.emit_num = emissions.shape[0]

        # [Np, D/R/C] transposed value arrays (lane-sliced per component)
        def t_pad(a):
            out = np.full((n, max(1, a.shape[0])), np.inf, dtype=MOD_PROB_DTYPE)
            if a.shape[0]:
                out[:, : a.shape[0]] = a.T
            return jnp.asarray(out)

        self.dv = t_pad(sop.diag_vals)
        self.rv = t_pad(sop.row_vals)
        self.cv = t_pad(sop.col_vals)
        resv = np.full((1, max(1, sop.residual_nnz)), np.inf, dtype=MOD_PROB_DTYPE)
        if sop.residual_nnz:
            resv[0, : sop.residual_nnz] = sop.res_vals
        self.resv = jnp.asarray(resv)

        self.e_pad = max(E_PAD, ((self.emit_num + 31) // 32) * 32)
        em_pad = np.full((n, self.e_pad), BIG, dtype=MOD_PROB_DTYPE)
        em_pad[:, : self.emit_num] = np.minimum(emissions.T, BIG)
        self.em_clamped = jnp.asarray(em_pad)  # [Np, e_pad] (path kernel, v0)
        # exact bf16 [hi | lo] split for the scores kernel's emission dot:
        # hi + lo reconstructs em_pad to 16 mantissa bits (BIG survives
        # the split ≥ BIG_THRESHOLD); see the module docstring
        self.em_split = jnp.asarray(_split_em_cat(em_pad))  # [Np, 2·e_pad]
        # exact bf16 [hi | mid | lo] split for PATH-producing flows: full
        # 24-bit mantissa reconstruction, proved bit-exact on the host for
        # this table (any MXU accumulation order); falls back to the
        # precision=HIGHEST f32 dot if the proof fails
        em3, em3_ok = _split_em_cat3(em_pad)
        self._em3_ok = em3_ok
        self.em_exact3 = jnp.asarray(em3) if em3_ok else None  # [Np, 3·e_pad]
        # uniform-column decomposition (scores kernel only; bit-exact):
        # the shared [n, 1] reduce mask replaces cv as the kernel input
        plan = _plan_uniform_cols(sop)
        self._col_plan = plan[1] if plan else None
        self._cv_mask = jnp.asarray(plan[0]) if plan else None
        # uniform-row decomposition (scores kernel only; exact min
        # multiset — see _plan_uniform_rows)
        self._row_plan = _plan_uniform_rows(sop)
        # frame-shifted unmasked scores kernel (_make_fs_kernel): the
        # single-diagonal + uniform-plan operator class — i.e. the whole
        # Pfam corpus — trades the per-substep carry roll for pre-rolled
        # operand copies and folds the shared reduce into the store chain
        self._em_pad_np = em_pad  # [Np, e_pad] f32 (FS operand builds)
        self._fs_ok = (
            self._col_plan is not None
            and self._row_plan is not None
            and sop.residual_nnz == 0
            and len(sop.diag_offsets) == 1
            and sop.diag_offsets[0] % n != 0
        )
        self._fs_cache: dict[int, tuple] = {}
        if self._fs_ok:
            mask_np = np.asarray(plan[0])[:, 0]
            self._fs_shared = frozenset(np.nonzero(mask_np == 0.0)[0].tolist())
            srows = {t for t, _, _ in self._col_plan}
            srows |= {r for r, _, _ in self._row_plan[1]}
            srows |= {r for r, _, _ in self._row_plan[2]}
            self._fs_special_rows = frozenset(srows)
            # host copy of the single diagonal for the operand builder
            # (the stacks are cached as NUMPY — safe to build lazily even
            # inside a jit trace, where a cached jnp array would leak its
            # tracer; pallas_call lifts them as compile-time constants)
            self._dv_np = np.full((n, 1), np.inf, dtype=MOD_PROB_DTYPE)
            self._dv_np[:, 0] = sop.diag_vals[0]
        self.pi = jnp.asarray(pi)  # [Np]
        # streaming symbol uploads ride the narrowest dtype the alphabet
        # allows (int8 covers the whole amino-acid corpus)
        self._sym_dtype = np.int8 if self.emit_num <= 127 else np.int32
        # content fingerprint guarding persisted stream states: values AND
        # structure (two models can share value bytes while differing in
        # diagonal offsets / index placement), with shape+dtype delimiters
        # so array-boundary collisions are impossible
        import hashlib

        h = hashlib.sha1()
        for a in (
            emissions, pi,
            sop.diag_vals, sop.row_vals, sop.col_vals, sop.res_vals,
            np.asarray(sop.diag_offsets, np.int64),
            np.asarray(sop.row_idx, np.int64),
            np.asarray(sop.col_idx, np.int64),
            np.asarray(sop.res_src, np.int64),
            np.asarray(sop.res_dst, np.int64),
        ):
            a = np.ascontiguousarray(a)
            h.update(f"{a.shape}{a.dtype}|".encode())
            h.update(a.tobytes())
        self._model_key = h.hexdigest()

        self._jit_run = jax.jit(self._run, static_argnames=("masked", "b_real"))
        self._jit_run_path = jax.jit(
            self._run_path, static_argnames=("masked", "b_real")
        )
        self._jit_begin = jax.jit(self._begin)
        self._jit_feed = jax.jit(self._feed)
        # PATH-stream feeds accumulate with the exact HIGHEST emission dot
        # so checkpoints match the path kernel's finalize re-runs (module
        # docstring precision note)
        self._jit_feed_path = jax.jit(
            functools.partial(self._feed, exact_em=True)
        )
        self._jit_extract = jax.jit(self._extract, static_argnames=("b_real",))
        self._jit_last = jax.jit(self._last_state)
        self._jit_path_block = jax.jit(
            self._path_block, static_argnames=("b_real",)
        )

    def _plan_for(self, b: int) -> tuple[int, int]:
        """(lane_block, unroll) for a base-kernel call over ``b`` lanes.

        Non-128-multiples can't unroll (per-block symbol indexing); an
        explicitly pinned unroll is honored. The lane block follows the
        FS kernel's stall-filling result (`_fs_plan_for`), re-measured on
        the base kernel (`scripts/exp_base_laneblock.py` →
        ``bench_out/base_laneblock.json``, b=512, Np=2432): one wide
        [Np, 512] block runs 5.42→3.03 µs/step plain and 5.56→2.97
        masked (u4 ≥ u2 at the wide block), bit-equal — same serialized
        substep chain, same 4 independent per-128-lane dependency chains
        for Mosaic to interleave. At lb=128 the measured tiers stand:
        unroll 4 is +5% over u2 at b=512 but −18% at b=128 (the wider
        per-cell em_sel doesn't amortize on one block)."""
        if b % BB != 0:
            return BB, 1
        lb = next(
            (
                w
                for w in (512, 256)
                if b % w == 0 and 2 * self.n * w * 4 <= 32 << 20
            ),
            BB,
        )
        if self.unroll is not None:
            return lb, self.unroll
        if lb > BB:
            return lb, 4
        return BB, (4 if b >= 4 * BB else 2)

    def _fs_plan_for(self, b: int) -> tuple[int, int]:
        """(lane_block, unroll) for a frame-shifted decode of ``b`` lanes.

        The kernel is latency-stall bound (the FS A/B at 128-lane blocks
        measured 1.006× vs the base kernel despite far fewer VPU passes),
        and the block-outer grid runs each block's whole time loop with
        zero ILP across blocks. One WIDE block hands Mosaic
        ``lane_block/128`` independent dependency chains per substep to
        interleave into the stalls: measured at b=512
        (``bench_out/fs_laneblock*.json``), 128→256→512-lane blocks run
        5.47→3.25→2.55 µs/step — the 512-lane block is ~2× the committed
        102–104M headline, bit-equal. unroll 4 beats 8 at the wide block
        (2.43 vs 2.55; less VMEM pressure), while 8 wins at 128
        (``fs_unroll.json``). Width is capped so the two [Np, lb] f32
        blocks (carry in + out) stay within half the kernel's 64 MB
        scoped-VMEM budget — only binding past ~8k states."""
        if b % BB != 0:
            return BB, 1
        lb = next(
            (
                w
                for w in (512, 256)
                if b % w == 0 and 2 * self.n * w * 4 <= 32 << 20
            ),
            BB,
        )
        if self.unroll is not None:
            return lb, self.unroll
        return lb, (4 if lb > BB else 8 if b >= 4 * BB else 2)

    def _scores_core(self, seqs_t, lengths, masked: bool) -> jax.Array:
        """State-major fused decode: [T, B] symbols → [Np, B] scores.

        The shard_map DP wrapper (``parallel.sharded.make_fused_dp``) calls
        this directly on each device's lane block — the batch axis is
        embarrassingly parallel, so the pallas_call runs unmodified on the
        local shard with zero collectives.
        """
        v0 = self.em_clamped[:, :].take(seqs_t[0], axis=1) + self.pi[:, None]
        obs = seqs_t[1:, None, :]  # [T-1, 1, B] raw symbols
        t_steps = obs.shape[0]
        b = obs.shape[2]

        # multi-block batches (b = k·BB) unroll too: the seq BlockSpec
        # indexes (t, 0, i) so each lane block sees its own symbol stream
        # (validated vs oracle in interpret mode and on hardware)
        if not masked and self._fs_ok:
            # uniform-length batches (``prepare`` compiles the mask out)
            # on the single-diagonal corpus class take the frame-shifted
            # kernel: no per-substep roll, reduce folded — bit-identical
            # output (tests/test_fused.py asserts array_equal vs base) —
            # in WIDE lane blocks (independent chains fill the stalls)
            lb, unroll = self._fs_plan_for(b)
            chunks, tail = divmod(t_steps, unroll)
            out = v0
            if chunks:
                out = self._pallas_fs(out, obs[: chunks * unroll], unroll, lb)
            if tail:
                out = self._pallas_fs(out, obs[chunks * unroll :], tail, lb)
            return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)
        lb, unroll = self._plan_for(b)
        chunks, tail = divmod(t_steps, unroll)
        out = v0
        if chunks:
            out = self._pallas(
                out, obs[: chunks * unroll], lengths, masked, unroll, 0,
                lane_block=lb,
            )
        if tail:
            out = self._pallas(
                out, obs[chunks * unroll :], lengths, masked, tail,
                chunks * unroll, lane_block=lb,
            )
        return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)

    def _run(self, seqs_t, lengths, masked: bool = True, b_real: int | None = None):
        """seqs_t: [T, B] int32 time-major; lengths: [1, B] int32.

        Returns [B, Np] scores with ``BIG``-range values mapped to +inf;
        ``b_real`` (static) slices padding lanes off on device so the
        host transfer only carries real sequences.
        """
        out = self._scores_core(seqs_t, lengths, masked).T
        return out if b_real is None else out[:b_real, : self.states_num]

    def _pallas(
        self, v0, obs, lengths, masked: bool, unroll: int, t0: int,
        exact_em: bool = False, lane_block: int | None = None,
    ):
        n = self.n
        steps, _, b = obs.shape
        lb = lane_block or BB
        grid = (b // lb, steps // unroll)
        exact_parts = 3 if (exact_em and self._em3_ok) else 1
        kernel = _make_unrolled_kernel(
            self.sop, masked, unroll, t0, exact_em, self._col_plan, self._row_plan,
            exact_parts,
        )
        if exact_em:
            em_in = self.em_exact3 if self._em3_ok else self.em_clamped
        else:
            em_in = self.em_split
        em_spec = pl.BlockSpec(
            (n, em_in.shape[1]),
            lambda i, t: (0, 0),
            memory_space=pltpu.VMEM,
        )
        cv_in = self.cv if self._col_plan is None else self._cv_mask
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (n, self.dv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n, self.rv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n, cv_in.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, self.resv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                em_spec,
                pl.BlockSpec(
                    (unroll, 1, lb),
                    lambda i, t: (t, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, b), jnp.float32),
            # The default 16 MB scoped-VMEM budget is just under this
            # kernel's working set when Mosaic additionally decides to keep
            # a small obs operand fully resident (observed: [1024,1,512]
            # s32 obs → 16.43 MB and a compile OOM, while larger obs
            # stream and fit). v5e has 128 MB physical VMEM; 64 MB keeps
            # every observed shape comfortably legal.
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )(v0, self.dv, self.rv, cv_in, self.resv, em_in, obs, lengths)

    def _fs_operands(self, unroll: int):
        """Pre-rolled per-substep operand stacks for the frame-shifted
        kernel (cached per unroll depth): after substep ``u`` the carry
        frame is ``φ = (u+1)·d``, so every state-indexed operand the
        substep touches ships as ``np.roll(·, −φ, axis=0)`` — compile-time
        data movement replacing the runtime roll pass."""
        ops = self._fs_cache.get(unroll)
        if ops is not None:
            return ops
        n = self.n
        d = self.sop.diag_offsets[0] % n
        # folded-reduce bulk mask: shared rows MINUS the special-written
        # rows (their final values are min-ed back in by the kernel)
        excl_true = np.full((n, 1), np.inf, np.float32)
        incl = sorted(self._fs_shared - self._fs_special_rows)
        excl_true[incl, 0] = 0.0
        dvs, ems, excls = [], [], []
        for u in range(unroll):
            phi = ((u + 1) * d) % n
            dvs.append(np.roll(self._dv_np, -phi, axis=0))
            ems.append(_split_em_cat(np.roll(self._em_pad_np, -phi, axis=0)))
            excls.append(np.roll(excl_true, -phi, axis=0))
        # cached as NUMPY: trace-safe to build lazily inside jit (a cached
        # jnp array would leak its tracer), lifted per-compile as constants
        ops = (np.stack(dvs), np.stack(ems), np.stack(excls))
        self._fs_cache[unroll] = ops
        return ops

    def _pallas_fs(self, v0, obs, unroll: int, lane_block: int | None = None):
        """Frame-shifted unmasked scores pass (see _make_fs_kernel).

        ``lane_block``: lanes per grid block (default ``BB``). The kernel
        is latency-stall bound, not op bound (the FS A/B proved it), and
        the default grid runs each 128-lane block's ENTIRE time loop
        before the next block — zero ILP across the blocks' independent
        dependency chains. A wider block (e.g. 512 = the whole serving
        batch in ONE [Np, 512] VMEM block) hands Mosaic ``lane_block/128``
        independent chains per substep to interleave into the stalls.
        """
        n = self.n
        steps, _, b = obs.shape
        lb = lane_block or BB
        grid = (b // lb, steps // unroll)
        dv_s, em_s, ex_s = self._fs_operands(unroll)
        kernel = _make_fs_kernel(
            self.sop, unroll, self._col_plan, self._row_plan, self._fs_shared
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (unroll, n, 1), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (unroll, n, 2 * self.e_pad),
                    lambda i, t: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (unroll, n, 1), lambda i, t: (0, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (unroll, 1, lb), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, b), jnp.float32),
            # running shared-column min, carried across grid steps
            scratch_shapes=[pltpu.VMEM((1, lb), jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )(v0, dv_s, em_s, self._cv_mask, ex_s, obs)

    def _path_lb(self, b: int) -> int:
        """Wide-lane-block selection for the path/backtrace kernels —
        the scores kernels' stall-filling result (`_plan_for`) re-measured
        on the path flow (`scripts/exp_path_laneblock.py` →
        ``bench_out/path_laneblock.json``); the VMEM cap additionally
        counts the [1, Np, lb] int16 src block these kernels stream."""
        if b % BB != 0:
            return BB
        return next(
            (
                w
                for w in (512, 256)
                if b % w == 0 and (2 * 4 + 2) * self.n * w <= 32 << 20
            ),
            BB,
        )

    def _path_pallas(
        self, v0, obs, lengths, masked: bool, lane_block: int | None = None
    ):
        """One path-kernel invocation: (v0 [Np,B], obs [T,1,B]) →
        (carry_out [Np,B], src [T, Np, B] int16). Shared by the one-shot
        path decode and the streaming finalize blocks.

        The lane block follows the scores kernels' stall-filling result:
        the path kernel has the same block-outer grid and serialized
        per-step dependency chain, so one wide [Np, lb] block hands
        Mosaic lb/128 independent chains to interleave (`_path_lb`)."""
        n = self.n
        t_steps, _, b = obs.shape
        lb = lane_block or self._path_lb(b)
        em_in = self.em_exact3 if self._em3_ok else self.em_clamped
        kernel = _make_path_kernel(self.sop, masked, 3 if self._em3_ok else 1)
        return pl.pallas_call(
            kernel,
            grid=(b // lb, t_steps),
            in_specs=[
                pl.BlockSpec((n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (n, self.dv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n, self.rv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n, self.cv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, self.resv.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (n, em_in.shape[1]), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, lb), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, n, lb), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, b), jnp.float32),
                jax.ShapeDtypeStruct((t_steps, n, b), jnp.int16),
            ],
            # same raised scoped-VMEM budget as _pallas (small operands
            # can be kept fully resident by Mosaic — see note there)
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )(v0, self.dv, self.rv, self.cv, self.resv, em_in, obs, lengths)

    def _backtrace_pallas(self, src, last, lane_block: int | None = None):
        """Reverse per-lane walk: (src [T, Np, B], last [1, B]) →
        rev [T, B] int32 — rev[j] = state at the position src[j] leads
        into minus one (see _backtrace_kernel)."""
        n = self.n
        t_steps, _, b = src.shape
        t_rev = t_steps  # captured for the reversed index maps
        # same wide-lane-block selection as _path_pallas (the walk's
        # per-step select+reduce chain is serialized per lane block too)
        lb = lane_block or self._path_lb(b)
        rev = pl.pallas_call(
            _backtrace_kernel,
            grid=(b // lb, t_steps),
            in_specs=[
                pl.BlockSpec(
                    (1, n, lb),
                    lambda i, t: (t_rev - 1 - t, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, lb), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, lb), lambda i, t: (t_rev - 1 - t, 0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((t_steps, 1, b), jnp.int32),
            scratch_shapes=[pltpu.VMEM((1, lb), jnp.int32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )(src, last)
        return rev[:, 0, :]

    def _path_core(self, seqs_t, lengths, masked: bool):
        """State-major fused path decode: → (scores [Np, B], path [T, B]).

        Like ``_scores_core``, directly shardable over the lane axis with
        shard_map (the backtrace kernel is per-lane too).
        """
        v0 = self.em_clamped[:, :].take(seqs_t[0], axis=1) + self.pi[:, None]
        obs = seqs_t[1:, None, :]  # [T-1, 1, B] raw symbols
        out, src = self._path_pallas(v0, obs, lengths, masked)
        scores = jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)  # [Np, B]
        last = jnp.argmin(scores, axis=0).astype(jnp.int32)[None, :]  # [1, B]
        rev = self._backtrace_pallas(src, last)  # [T-1, B]
        path = jnp.concatenate([rev, last], axis=0)  # [T, B]
        return scores, path

    def _run_path(self, seqs_t, lengths, masked: bool = True, b_real: int | None = None):
        """Fused decode emitting (scores [B, Np], paths [B, T]).

        The kernel stores the winning source state per (step, state, lane)
        as int16; backtrace is a reverse per-lane gather scan on device, so
        only the [B, T] paths cross back to the host.
        """
        scores, path = self._path_core(seqs_t, lengths, masked)
        scores, path = scores.T, path.T
        if b_real is not None:
            scores = scores[:b_real, : self.states_num]
            path = path[:b_real]
        # states fit int16 (path_supported guarantees it) — halve the
        # [B, T] D2H transfer; callers re-widen to int32 on host
        return scores, path.astype(jnp.int16)

    # HBM budget for the int16 backpointer tensor before falling back to
    # the per-sequence XLA path decode.
    MAX_PATH_BYTES = 6 << 30

    def path_supported(self, t_max: int, batch: int = BB) -> bool:
        """Whether ONE fused path call of this shape fits the HBM budget.

        `decode_path_batch` additionally chunks wide batches into
        successive budget-sized calls, so a batch is decodable whenever
        ``path_supported(t_max)`` holds at the default 128-lane block.
        """
        if self.n > np.iinfo(np.int16).max:  # int16 backpointers
            return False
        b_pad = ((batch + BB - 1) // BB) * BB
        return max(0, t_max - 1) * self.n * b_pad * 2 <= self.MAX_PATH_BYTES

    def _path_lane_budget(self, t_q: int) -> int:
        """Max lanes (multiple of 128) whose backpointer tensor fits."""
        per_lane = max(1, t_q - 1) * self.n * 2
        return (self.MAX_PATH_BYTES // per_lane) // BB * BB

    def decode_path_batch(
        self, seqs: list[np.ndarray], bucketed: bool = True
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """[(scores, path)] per sequence, exact oracle tie-breaking.

        Bucketing (see `decode_batch`) additionally shrinks the int16
        backpointer tensor: each bucket allocates ``t_q·Np·lanes`` instead
        of every lane paying the global max length.
        """
        if not seqs:
            return []
        if bucketed:
            lens = [len(s) for s in seqs]
            plan = bucket_plan(lens, lane_block=BB) or [
                (list(range(len(seqs))), max(lens))
            ]
            # lane-chunk each bucket so no single call's backpointer tensor
            # exceeds the HBM budget (a 512×7096 covid-profile batch needs
            # 17.7 GB in one call — more than a v5e chip has)
            calls = []
            for idx, t_q in plan:
                if not self.path_supported(t_q):
                    # quantization overshoot (≤1.5×) may cross the budget
                    # even when the real lengths fit — trade shape reuse
                    # for feasibility before giving up
                    t_q = max(lens[i] for i in idx)
                    if not self.path_supported(t_q):
                        raise ValueError(
                            f"path decode of length {t_q} exceeds the "
                            f"backpointer budget even at {BB} lanes; use "
                            f"the per-sequence XLA path decode"
                        )
                step = max(BB, self._path_lane_budget(t_q))
                calls += [
                    (idx[i : i + step], t_q) for i in range(0, len(idx), step)
                ]
        else:
            t_max = max(len(s) for s in seqs)
            if not self.path_supported(t_max, batch=len(seqs)):
                # refuse BEFORE dispatch: the one-call whole-batch bp
                # tensor would device-OOM (17.7 GB at 512 covid lanes ×
                # 2405 states) — callers record this budget rejection as
                # the NaN memory-policy column
                raise ValueError(
                    f"whole-batch path decode ({len(seqs)} lanes × "
                    f"{t_max} steps) exceeds the backpointer budget; "
                    f"use bucketed=True"
                )
            calls = [(list(range(len(seqs))), t_max)]
        outs = []
        for idx, t_q in calls:  # enqueue all calls, drain in order below
            st, ln, masked = self.prepare([seqs[i] for i in idx], t_pad=t_q)
            outs.append(
                self._jit_run_path(st, ln, masked=masked, b_real=len(idx))
            )
        result: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(seqs)
        for (idx, _), (scores, paths) in zip(calls, outs):
            scores = np.asarray(scores)
            paths = np.asarray(paths)
            for row, i in enumerate(idx):
                result[i] = (
                    scores[row],
                    paths[row, : len(seqs[i])].astype(np.int32),
                )
        return result

    # ---- streaming decode: constant-memory carry over unbounded input ----
    #
    # The kernel's v0 input IS a resumable carry (the grid's t==0 step
    # seeds the VMEM accumulator from it), so decoding composes over
    # chunks: scores(concat(c1, c2)) == feed(feed(begin(o0), rest(c1)), c2).
    # Memory is O(Np·B) regardless of total length — no [T, B] tensor ever
    # materializes. No reference analog (run_Viterbi takes the full
    # sequence, Viterbi_impl.h:8); this is the serving/long-context form.

    def _check_path_stream(self) -> None:
        if self.n > np.iinfo(np.int16).max:
            raise ValueError("path streaming needs int16-addressable states")

    def _last_state(self, carry):
        """Per-lane argmin end state with +inf restored (ties → lowest)."""
        scores = jnp.where(carry >= BIG_THRESHOLD, jnp.inf, carry)
        return jnp.argmin(scores, axis=0).astype(jnp.int32)[None, :]

    def _path_block(self, carry, chunk, lengths, boundary, b_real: int):
        """One finalize block: rematerialize backpointers, backtrace.

        Returns (piece [T_q, b_real] int16 — states at positions
        p+1..p+T_q relative to the chunk start p (entries past the real
        chunk length repeat the boundary via identity pad pointers; the
        caller slices [:t_c]) — and the new boundary rev[0] = state at
        position p)."""
        obs = chunk.astype(jnp.int32)[:, None, :]  # [T_q, 1, B]
        _, src = self._path_pallas(carry, obs, lengths, masked=True)
        # [T_q, B] states at positions p..p+T_q-1
        rev = self._backtrace_pallas(src, boundary)
        piece = jnp.concatenate([rev[1:], boundary], axis=0)  # p+1..p+T_q
        return piece[:, :b_real].astype(jnp.int16), rev[0:1]

    def _begin(self, syms):
        b = syms.shape[0]
        b_pad = ((b + BB - 1) // BB) * BB
        syms = jnp.pad(syms, (0, b_pad - b))
        return self.em_clamped[:, :].take(syms, axis=1) + self.pi[:, None]

    def _feed(self, carry, chunk, lengths, exact_em: bool = False):
        b = carry.shape[1]
        obs = chunk.astype(jnp.int32)[:, None, :]  # [T_q, 1, B]
        t_steps = obs.shape[0]
        lb, unroll = self._plan_for(b)
        chunks, tail = divmod(t_steps, unroll)
        out = carry
        if chunks:
            out = self._pallas(
                out, obs[: chunks * unroll], lengths, True, unroll, 0,
                exact_em, lane_block=lb,
            )
        if tail:
            out = self._pallas(
                out,
                obs[chunks * unroll :],
                lengths,
                True,
                tail,
                chunks * unroll,
                exact_em,
                lane_block=lb,
            )
        return out

    def _extract(self, carry, b_real: int | None = None):
        out = jnp.where(carry >= BIG_THRESHOLD, jnp.inf, carry).T
        if b_real is not None:  # slice padding lanes off before any D2H
            out = out[:b_real]
        return out[:, : self.states_num]

    def prepare(self, seqs: list[np.ndarray], t_pad: int | None = None):
        """Pad/transfer a batch once; returns (seqs_t, lengths, masked).

        A uniform-length batch compiles the mask out of the kernel
        (padding lanes evolve freely and are sliced off on extraction).
        Lane padding to the 128-block happens ON DEVICE: the host ships
        only the real sequences (H2D through the axon tunnel is ~60 MB/s,
        so a single 3,500-symbol sequence uploads 14 KB instead of the
        1.8 MB padded block — the difference between a ~31 ms and ~57 ms
        single-sequence decode). ``t_pad`` forces the time dimension to a
        fixed (e.g. bucket-quantized) length so repeated ragged workloads
        reuse compiled shapes.
        """
        seqs = [validate_obs_seq(s, self.emit_num) for s in seqs]
        if any(len(s) == 0 for s in seqs):
            # the recurrence consumes seq[0] before any masking (the
            # reference likewise indexes seq[0] unconditionally,
            # GraphBLAS_impl.cpp:59)
            raise ValueError("cannot decode an empty sequence")
        t_min = max(2, t_pad or 2)
        b_real = len(seqs)
        b_pad = ((b_real + BB - 1) // BB) * BB
        t_total = max(t_min, max(len(s) for s in seqs))
        lengths = np.zeros(b_pad, dtype=np.int32)
        lengths[:b_real] = [len(s) for s in seqs]
        # compact upload: concatenated symbols + per-lane offsets, expanded
        # to [T, B] on device (padding lanes alias lane 0 — discarded)
        off = np.zeros(b_pad, dtype=np.int32)
        np.cumsum(lengths[: b_real - 1], out=off[1:b_real])
        last = np.where(lengths > 0, off + lengths - 1, 0).astype(np.int32)
        # narrow upload: symbols ship at the smallest dtype the alphabet
        # allows (int8 for the whole amino-acid corpus — 4× less H2D
        # through a ~60 MB/s tunnel), widened on device after the gather
        flat = np.concatenate(seqs).astype(self._sym_dtype)
        q_tot = _quantize_total(flat.size)
        if q_tot != flat.size:  # bound the set of compiled expand shapes
            flat = np.pad(flat, (0, q_tot - flat.size))
        seqs_t = _expand_symbols(
            jnp.asarray(flat), jnp.asarray(off), jnp.asarray(last), t_total
        )
        # mask when lengths differ OR when padding added timesteps every
        # lane would otherwise run (uniform length-1 batch, t_pad overshoot)
        masked = (
            len({len(s) for s in seqs}) > 1
            or max(len(s) for s in seqs) < t_min
        )
        return seqs_t, jnp.asarray(lengths[None, :]), masked

    def run_prepared(self, handle) -> jax.Array:
        """Fused decode of a prepared batch; returns [B, Np] device scores."""
        seqs_t, lengths, masked = handle
        return self._jit_run(seqs_t, lengths, masked=masked)

    def decode_batch(
        self, seqs: list[np.ndarray], bucketed: bool = True
    ) -> list[np.ndarray]:
        """Decode a set of sequences; returns final score vectors.

        Ragged multi-block batches are length-bucketed (`bucket_plan`):
        each bucket runs only its own quantized max length instead of the
        global max, with all bucket calls enqueued back-to-back and the
        device queue drained once. ``bucketed=False`` forces the single
        whole-batch call (used by the equality tests to cross-check).
        """
        if not seqs:
            return []
        plan = (
            bucket_plan([len(s) for s in seqs], lane_block=BB)
            if bucketed
            else None
        )
        if plan is None:
            seqs_t, lengths, masked = self.prepare(seqs)
            v = np.asarray(
                self._jit_run(seqs_t, lengths, masked=masked, b_real=len(seqs))
            )
            return [v[i] for i in range(len(seqs))]
        outs = []
        for idx, t_q in plan:  # enqueue every bucket
            st, ln, masked = self.prepare([seqs[i] for i in idx], t_pad=t_q)
            outs.append(self._jit_run(st, ln, masked=masked, b_real=len(idx)))
        # single device-side concat → ONE host transfer for all buckets
        v = np.asarray(jnp.concatenate(outs, axis=0))
        result: list[np.ndarray | None] = [None] * len(seqs)
        row = 0
        for idx, _ in plan:
            for i in idx:
                result[i] = v[row]
                row += 1
        return result
