"""State-sharded (TP) decode that KEEPS the fused Pallas kernel.

Round-2 state of the art: TP existed only as a per-step XLA scan
(:mod:`spec_viterbi_tpu.parallel.structured_tp`) — the moment a model needs
state sharding, the flagship fused kernel was abandoned. This module closes
that gap for the operator class where chunked exchange is exact:

**Banded operators** (diagonal components only — no dense rows/cols, no
residual). Information propagates at most ``max|d|`` states per step, so a
``c``-step chunk needs only a ``c·max|d|``-row halo: each shard runs the
UNMODIFIED fused whole-sequence kernel on its state window (own block +
halo rows) for ``c`` steps entirely in VMEM, then exchanges fresh halo
slabs with its neighbors via two ``ppermute``s. Communication is
**2 ppermutes per chunk** instead of per step — amortized bytes/step =
``2·h·B·4/c`` — while the per-shard compute keeps the kernel's measured
~3.3 µs/step/128-lane-block floor instead of per-step XLA dispatch.

Why the Pfam corpus models are NOT in this class, and cannot be: their
operators carry dense columns (every state → background) feeding dense
rows (background → every state) with a one-step delay, so information
crosses the whole state space **every step** — any exact chunked scheme
must precompute per-lane impulse responses of the coupling channel
(``k`` extra vector evolutions per ``k``-step chunk → ``k×`` compute to
save ``1/k`` collectives, a strictly losing trade at the measured 64 B/step
collective cost, BASELINE.md TP accounting). Coupled models therefore
route to the per-step halo TP (``structured_tp``), which is already at the
communication lower bound for them. ``fused_tp_supported`` encodes the
split; the decoder in :mod:`spec_viterbi_tpu.parallel` picks automatically.

Correctness: window rows evolve exactly while their dependency cone stays
in-window; after ``c`` steps the cone of the interior block extends
exactly ``c·max|d|`` rows — the halo — so interior rows are bit-identical
to the unsharded kernel (same float order: the kernel body is unchanged).
Wrap-around garbage from the kernel's cyclic ``pltpu.roll`` enters at the
window edge and advances ``|d|`` rows/step, contaminating only the halo
rows that are discarded and re-exchanged each chunk. Validated against the
unsharded kernel and the oracle on the CPU mesh (interpret mode) in
``tests/test_fused_tp.py``.

No reference analog: the reference is single-device (SURVEY.md §2.9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from spec_viterbi_tpu.hmm import validate_obs_seq
from spec_viterbi_tpu.ops.fused_pallas import (
    BB,
    BIG,
    BIG_THRESHOLD,
    E_PAD,
    _make_path_kernel,
    _make_unrolled_kernel,
    _split_em_cat,
)
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.parallel.mesh import STATE_AXIS
from spec_viterbi_tpu.utils.batching import pad_batch

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def fused_tp_supported(sop: StructuredOperator, shards: int, chunk: int) -> bool:
    """Whether the chunked-halo fused kernel can TP-shard this operator.

    Requires a purely banded operator (coupled components need per-step
    exchange — module docstring), an evenly divisible state space, and
    halos that reach only the adjacent shard."""
    if sop.row_idx or sop.col_idx or sop.residual_nnz:
        return False
    if shards < 2 or sop.n % shards:
        return False
    block = sop.n // shards
    if block % 8:
        return False
    h_lo = _round8(chunk * max([d for d in sop.diag_offsets if d > 0], default=0))
    h_hi = _round8(chunk * max([-d for d in sop.diag_offsets if d < 0], default=0))
    return h_lo <= block and h_hi <= block


class FusedTPDecoder:
    """Chunked-halo TP decode for one banded HMM over a ``state`` mesh."""

    def __init__(
        self,
        sop: StructuredOperator,
        emissions: np.ndarray,
        pi: np.ndarray,
        mesh: Mesh | None,
        chunk: int = 16,
        interpret: bool = False,
        shards: int | None = None,
    ):
        """``mesh=None`` + ``shards=K`` builds the WINDOW HARNESS: the
        per-shard window geometry, padded operands and the window-shaped
        Pallas kernels, but no shard_map programs — so one real chip can
        Mosaic-compile and parity-check the exact kernel a K-shard pod
        would run (``decode_batch_emulated``). Round 3's fused-TP evidence
        was interpret-mode only; a Mosaic layout rejection (e.g. the
        128-alignment rules) would have surfaced first on a real pod
        (VERDICT r3 #4)."""
        self.sop = sop
        self.mesh = mesh
        self.chunk = int(chunk)
        self.interpret = interpret
        self.states_num = sop.states_num
        self.emit_num = int(emissions.shape[0])
        if mesh is None:
            if shards is None:
                raise ValueError("mesh=None (window harness) requires shards=")
        else:
            shards = mesh.shape[STATE_AXIS]
        if not fused_tp_supported(sop, shards, self.chunk):
            raise ValueError(
                "operator/mesh/chunk outside the chunked-halo TP class "
                "(banded only; see fused_tp_supported)"
            )
        n = sop.n
        self.n = n
        self.shards = shards
        self.block = n // shards
        self.h_lo = _round8(
            self.chunk * max([d for d in sop.diag_offsets if d > 0], default=0)
        )
        self.h_hi = _round8(
            self.chunk * max([-d for d in sop.diag_offsets if d < 0], default=0)
        )
        self.n_win = self.h_lo + self.block + self.h_hi

        # window-shaped operator structure for the kernel factory (values
        # are pallas_call INPUTS, sliced per shard at trace time)
        d_cnt = len(sop.diag_offsets)
        self._sop_win = StructuredOperator(
            n=self.n_win,
            states_num=self.n_win,
            diag_offsets=sop.diag_offsets,
            diag_vals=np.zeros((d_cnt, self.n_win), np.float32),
            row_idx=(),
            row_vals=np.zeros((0, self.n_win), np.float32),
            col_idx=(),
            col_vals=np.zeros((0, self.n_win), np.float32),
            res_src=np.zeros(0, np.int32),
            res_dst=np.zeros(0, np.int32),
            res_vals=np.zeros(0, np.float32),
            nnz=sop.nnz,
        )

        # globally padded operand arrays: h_lo/h_hi +inf guard rows so
        # every shard slices a uniform window with no clamping
        def pad_rows(a, fill):
            out = np.full(
                (self.h_lo + n + self.h_hi, a.shape[1]), fill, dtype=np.float32
            )
            out[self.h_lo : self.h_lo + n] = a
            return out

        dv_t = np.full((n, max(1, d_cnt)), np.inf, np.float32)
        if d_cnt:
            dv_t[:, :d_cnt] = sop.diag_vals.T
        self.e_pad = max(E_PAD, ((self.emit_num + 31) // 32) * 32)
        em_p = np.full((n, self.e_pad), BIG, np.float32)
        em_p[:, : self.emit_num] = np.minimum(np.asarray(emissions).T, BIG)
        self._dv_pad = jnp.asarray(pad_rows(dv_t, np.inf))
        em_pad_np = pad_rows(em_p, BIG)
        self._em_pad = jnp.asarray(em_pad_np)  # f32: v0 init + path kernel
        # bf16 [hi | lo] split for the scores window kernel's emission dot
        # — the SAME split values as the unsharded kernel's (guard rows
        # are BIG constants), keeping interior rows bit-identical to it
        self._em_split_pad = jnp.asarray(_split_em_cat(em_pad_np))
        self._pi_pad = jnp.asarray(
            pad_rows(np.asarray(pi, np.float32)[:, None], np.inf)[:, 0]
        )
        if mesh is not None:
            self._decode = self._build()
            self._decode_path = self._build_path()

    def _pallas_win(self, v0, dv_win, em_win, obs, lengths):
        """One c-step fused-kernel run on a [n_win, B] state window.
        ``em_win`` is the [n_win, 2·e_pad] bf16 [hi | lo] split window."""
        n = self.n_win
        steps, _, b = obs.shape
        kernel = _make_unrolled_kernel(self._sop_win, True, 1, 0)
        d_cols = self._dv_pad.shape[1]
        rv = jnp.full((n, 1), jnp.inf, jnp.float32)  # no rows/cols/residual
        cv = jnp.full((n, 1), jnp.inf, jnp.float32)
        resv = jnp.full((1, 1), jnp.inf, jnp.float32)
        call = pl.pallas_call(
            kernel,
            grid=(b // BB, steps),
            in_specs=[
                pl.BlockSpec((n, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, d_cols), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (n, 2 * self.e_pad), lambda i, t: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, 1, BB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, b), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )
        return call(v0, dv_win, rv, cv, resv, em_win, obs, lengths)

    def _build(self):
        mesh, c = self.mesh, self.chunk
        block, h_lo, h_hi, n_win = self.block, self.h_lo, self.h_hi, self.n_win
        n, shards = self.n, self.shards
        d_cols, e_pad = self._dv_pad.shape[1], self.e_pad

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P()),
            out_specs=P(None, STATE_AXIS),
            check_vma=False,  # pallas out carries no varying-axes annotation
        )
        def tp_scores(dv_pad, em_pad, pi_pad, em_split, seqs_t, lengths):
            r = jax.lax.axis_index(STATE_AXIS)
            start = r * block  # window start in PADDED row coordinates
            dv_win = jax.lax.dynamic_slice(dv_pad, (start, 0), (n_win, d_cols))
            em_win = jax.lax.dynamic_slice(em_pad, (start, 0), (n_win, e_pad))
            em_win_split = jax.lax.dynamic_slice(
                em_split, (start, 0), (n_win, 2 * e_pad)
            )
            pi_win = jax.lax.dynamic_slice(pi_pad, (start,), (n_win,))

            # global-row validity of window rows (padded coords [h_lo, h_lo+n))
            wrow = start + jax.lax.broadcasted_iota(jnp.int32, (n_win, 1), 0)
            valid = (wrow >= h_lo) & (wrow < h_lo + n)

            v_win = em_win[:, seqs_t[0]] + pi_win[:, None]
            t_steps = seqs_t.shape[0] - 1
            n_chunks = -(-t_steps // c)
            obs = jnp.pad(seqs_t[1:], ((0, n_chunks * c - t_steps), (0, 0)))
            obs = obs.reshape(n_chunks, c, 1, -1)
            s0s = 1 + c * jnp.arange(n_chunks)

            def chunk_body(v_win, xs):
                obs_c, s0 = xs
                len_c = jnp.clip(lengths[None, :] - s0 + 1, 1, c + 1).astype(
                    jnp.int32
                )
                out_win = kernel_call(v_win, dv_win, em_win_split, obs_c, len_c)
                interior = out_win[h_lo : h_lo + block]
                parts = []
                if h_lo:
                    lo = jax.lax.ppermute(
                        interior[block - h_lo :],
                        STATE_AXIS,
                        [(i, (i + 1) % shards) for i in range(shards)],
                    )
                    parts.append(lo)
                parts.append(interior)
                if h_hi:
                    hi = jax.lax.ppermute(
                        interior[:h_hi],
                        STATE_AXIS,
                        [(i, (i - 1) % shards) for i in range(shards)],
                    )
                    parts.append(hi)
                win = jnp.concatenate(parts, axis=0)
                # cyclic-wrap slabs at the global edges are not real rows
                return jnp.where(valid, win, jnp.inf), None

            kernel_call = self._pallas_win
            v_win, _ = jax.lax.scan(chunk_body, v_win, (obs, s0s))
            out = v_win[h_lo : h_lo + block]
            return jnp.where(out >= BIG_THRESHOLD, jnp.inf, out).T  # [B, block]

        return jax.jit(tp_scores)

    def _path_pallas_win(self, v0, dv_win, em_win, obs, lengths):
        """Path-kernel run on a window: (out [n_win, B], src [c, n_win, B]
        int16 WINDOW-LOCAL source rows; frozen steps store identity).
        ``em_win`` is the [n_win, e_pad] f32 window — the path kernel
        keeps the exact HIGHEST emission dot (tie-break contract)."""
        n = self.n_win
        steps, _, b = obs.shape
        kernel = _make_path_kernel(self._sop_win, True)
        d_cols = self._dv_pad.shape[1]
        rv = jnp.full((n, 1), jnp.inf, jnp.float32)
        cv = jnp.full((n, 1), jnp.inf, jnp.float32)
        resv = jnp.full((1, 1), jnp.inf, jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(b // BB, steps),
            in_specs=[
                pl.BlockSpec((n, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, d_cols), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, self.e_pad), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, BB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n, BB), lambda i, t: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, BB), lambda i, t: (t, 0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, b), jnp.float32),
                jax.ShapeDtypeStruct((steps, n, b), jnp.int16),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
            interpret=self.interpret,
        )(v0, dv_win, rv, cv, resv, em_win, obs, lengths)

    def _build_path(self):
        """Exact-path TP decode with the backpointer tensor SHARDED over
        state: each shard stores [T, block, B] int16 window-local pointers
        — 1/K of the one-shot kernel's bp tensor, which is the dominant
        device allocation of path decode (58 GiB at T=100k unsharded) —
        and the backtrace walks backwards with a [1, B] ``pmin`` per step
        (the pointer's owner shard contributes, others +inf).

        Window-local pointer ``p`` on shard ``r`` is global row
        ``p + r·block − h_lo``. Dead (all-inf) rows store normalized-0
        pointers (window coords); the ``max(·, 0)`` clamp maps those to
        global 0 on shard 0 only — which is the only shard whose dead
        rows the walk can ever dereference, because the backtrace starts
        at the per-lane argmin: an all-inf lane argmins to global state 0
        (shard 0) and stays there, and a finite walk only follows
        pointers of finite-score states. The clamp's other role is
        keeping the degenerate walk's indices in range; it is NOT a
        general dead-pointer-to-0 mapping on shards r > 0."""
        mesh, c = self.mesh, self.chunk
        block, h_lo, h_hi, n_win = self.block, self.h_lo, self.h_hi, self.n_win
        n, shards = self.n, self.shards
        d_cols, e_pad = self._dv_pad.shape[1], self.e_pad

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(None, STATE_AXIS), P(), P()),
            check_vma=False,
        )
        def tp_path(dv_pad, em_pad, pi_pad, seqs_t, lengths):
            r = jax.lax.axis_index(STATE_AXIS)
            start = r * block
            dv_win = jax.lax.dynamic_slice(dv_pad, (start, 0), (n_win, d_cols))
            em_win = jax.lax.dynamic_slice(em_pad, (start, 0), (n_win, e_pad))
            pi_win = jax.lax.dynamic_slice(pi_pad, (start,), (n_win,))
            wrow = start + jax.lax.broadcasted_iota(jnp.int32, (n_win, 1), 0)
            valid = (wrow >= h_lo) & (wrow < h_lo + n)

            v_win = em_win[:, seqs_t[0]] + pi_win[:, None]
            t_steps = seqs_t.shape[0] - 1
            n_chunks = -(-t_steps // c)
            obs = jnp.pad(seqs_t[1:], ((0, n_chunks * c - t_steps), (0, 0)))
            obs = obs.reshape(n_chunks, c, 1, -1)
            s0s = 1 + c * jnp.arange(n_chunks)

            def chunk_body(v_win, xs):
                obs_c, s0 = xs
                len_c = jnp.clip(lengths[None, :] - s0 + 1, 1, c + 1).astype(
                    jnp.int32
                )
                out_win, src_win = self._path_pallas_win(
                    v_win, dv_win, em_win, obs_c, len_c
                )
                interior = out_win[h_lo : h_lo + block]
                parts = []
                if h_lo:
                    lo = jax.lax.ppermute(
                        interior[block - h_lo :],
                        STATE_AXIS,
                        [(i, (i + 1) % shards) for i in range(shards)],
                    )
                    parts.append(lo)
                parts.append(interior)
                if h_hi:
                    hi = jax.lax.ppermute(
                        interior[:h_hi],
                        STATE_AXIS,
                        [(i, (i - 1) % shards) for i in range(shards)],
                    )
                    parts.append(hi)
                win = jnp.concatenate(parts, axis=0)
                win = jnp.where(valid, win, jnp.inf)
                return win, src_win[:, h_lo : h_lo + block, :]

            v_win, srcs = jax.lax.scan(chunk_body, v_win, (obs, s0s))
            srcs = srcs.reshape(n_chunks * c, block, -1)  # [T_pad, block, B]
            out = v_win[h_lo : h_lo + block]
            scores = jnp.where(out >= BIG_THRESHOLD, jnp.inf, out)  # [block, B]

            # global per-lane argmin end state (lowest index on ties):
            # all-gather the [block, B] finals — N·B floats, once
            full = jax.lax.all_gather(scores, STATE_AXIS)  # [K, block, B]
            full = full.reshape(n, -1)
            last = jnp.argmin(full, axis=0).astype(jnp.int32)[None, :]  # [1, B]

            def back(state, src_t):  # state [1, B] global rows
                local = state - r * block
                owned = (local >= 0) & (local < block)
                idx = jnp.clip(local, 0, block - 1)
                ptr = jnp.take_along_axis(src_t, idx, axis=0).astype(jnp.int32)
                ptr = jnp.maximum(ptr + r * block - h_lo, 0)
                cand = jnp.where(owned, ptr, jnp.int32(2**30))
                prev = jax.lax.pmin(cand, STATE_AXIS)
                return prev, prev

            _, rev = jax.lax.scan(back, last, srcs, reverse=True)
            # rev[t] = state at position t; full path = concat(rev, last)
            return scores.T, rev[:, 0, :], last

        return jax.jit(tp_path)

    def decode_path_batch(
        self, seqs: list[np.ndarray]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """[(scores, path)] per sequence — exact oracle tie-breaking, with
        the backpointer tensor state-sharded across the mesh."""
        if not seqs:
            return []
        seqs = [validate_obs_seq(s, self.emit_num) for s in seqs]
        batch, lengths = pad_batch(seqs, BB, min_t=2)
        scores, rev, last = self._decode_path(
            self._dv_pad,
            self._em_pad,
            self._pi_pad,
            jnp.asarray(batch.T.copy()),
            jnp.asarray(lengths),
        )
        scores = np.asarray(scores)
        full = np.concatenate([np.asarray(rev), np.asarray(last)], axis=0)
        out = []
        for i, s in enumerate(seqs):
            out.append(
                (scores[i, : self.states_num], full[: len(s), i].astype(np.int32))
            )
        return out

    def decode_batch_emulated(
        self, seqs: list[np.ndarray], check_path_kernel: bool = False
    ) -> list[np.ndarray]:
        """Single-chip emulation of the K-shard chunked-halo schedule.

        Runs the EXACT per-shard window kernel (``_pallas_win``) shard by
        shard on one device, with the halo exchange replaced by re-slicing
        each shard's window from a global padded carry after every chunk —
        mathematically identical to the two ``ppermute``s (the exchange IS
        a copy of the neighbor's interior edge rows). Validation harness
        for real hardware, not a serving path: it proves Mosaic accepts
        the window-shaped kernel (dynamic-sliced operands, n_win rows) and
        that interior rows stay bit-identical to the unsharded kernel —
        the claim ``tests/test_fused_tp.py`` could only check in interpret
        mode (VERDICT r3 #4). ``check_path_kernel`` also compiles the
        window path kernel and asserts its score output matches the
        scores kernel bit-for-bit.
        """
        if not seqs:
            return []
        seqs = [validate_obs_seq(s, self.emit_num) for s in seqs]
        batch, lengths = pad_batch(seqs, BB, min_t=2)
        seqs_t = jnp.asarray(batch.T.copy())
        lengths = np.asarray(lengths)
        c, block, h_lo, h_hi = self.chunk, self.block, self.h_lo, self.h_hi
        n, n_win, shards = self.n, self.n_win, self.shards
        d_cols, e_pad = self._dv_pad.shape[1], self.e_pad

        dv_wins, em_wins, em_wins_f32 = [], [], []
        for r in range(shards):
            s0 = r * block
            dv_wins.append(self._dv_pad[s0 : s0 + n_win])
            em_wins.append(self._em_split_pad[s0 : s0 + n_win])
            em_wins_f32.append(self._em_pad[s0 : s0 + n_win])  # path kernel

        # jit the window calls ONCE: eager pallas_call would rebuild the
        # kernel and re-query the remote compiler per (shard, chunk) —
        # ~32 round trips per case at the production shapes
        win_call = jax.jit(self._pallas_win)
        path_call = jax.jit(self._path_pallas_win) if check_path_kernel else None

        # global padded carry [h_lo + n + h_hi, B] (true +inf space)
        b = seqs_t.shape[1]
        em_full = np.asarray(self._em_pad)
        v0 = em_full[:, np.asarray(seqs_t[0])] + np.asarray(self._pi_pad)[:, None]
        v_pad = jnp.asarray(np.where(np.isfinite(v0), v0, np.inf))

        t_steps = seqs_t.shape[0] - 1
        n_chunks = -(-t_steps // c) if t_steps else 0
        obs_all = jnp.pad(seqs_t[1:], ((0, n_chunks * c - t_steps), (0, 0)))
        for ci in range(n_chunks):
            obs_c = obs_all[ci * c : (ci + 1) * c].reshape(c, 1, b)
            len_c = jnp.asarray(
                np.clip(lengths[None, :] - (1 + ci * c) + 1, 1, c + 1).astype(
                    np.int32
                )
            )
            interiors = []
            for r in range(shards):
                s0 = r * block
                win = jax.lax.dynamic_slice(v_pad, (s0, 0), (n_win, b))
                out_win = win_call(win, dv_wins[r], em_wins[r], obs_c, len_c)
                if check_path_kernel:
                    out_pk, _src = path_call(
                        win, dv_wins[r], em_wins_f32[r], obs_c, len_c
                    )
                    # the path kernel selects emissions with the exact
                    # HIGHEST dot, the scores kernel with the bf16 hi/lo
                    # split — agreement is to the split's 2^-18 relative
                    # coverage (c steps per chunk), not bit-exact
                    a = np.asarray(out_pk[h_lo : h_lo + block])
                    bwin = np.asarray(out_win[h_lo : h_lo + block])
                    fin = np.isfinite(a) & (np.abs(a) < BIG_THRESHOLD)
                    if not (
                        np.array_equal(fin, np.isfinite(bwin) & (np.abs(bwin) < BIG_THRESHOLD))
                        and np.allclose(a[fin], bwin[fin], atol=1e-2, rtol=0)
                    ):
                        raise AssertionError(
                            f"window path kernel diverged from scores kernel "
                            f"(shard {r}, chunk {ci})"
                        )
                interiors.append(out_win[h_lo : h_lo + block])
            # "exchange": rebuild the global carry from the interiors; the
            # next chunk's window slices pick up the fresh halos
            core = jnp.concatenate(interiors, axis=0)
            v_pad = jnp.concatenate(
                [
                    jnp.full((h_lo, b), jnp.inf, jnp.float32),
                    core,
                    jnp.full((h_hi, b), jnp.inf, jnp.float32),
                ],
                axis=0,
            )
        out = np.asarray(v_pad[h_lo : h_lo + n]).T  # [B, n]
        out = np.where(out >= BIG_THRESHOLD, np.inf, out)
        return [out[i, : self.states_num] for i in range(len(seqs))]

    def decode_batch(self, seqs: list[np.ndarray]) -> list[np.ndarray]:
        """Batched TP decode; [B, Np] scores sliced per sequence."""
        if not seqs:
            return []
        seqs = [validate_obs_seq(s, self.emit_num) for s in seqs]
        batch, lengths = pad_batch(seqs, BB, min_t=2)
        v = np.asarray(
            self._decode(
                self._dv_pad,
                self._em_pad,
                self._pi_pad,
                self._em_split_pad,
                jnp.asarray(batch.T.copy()),
                jnp.asarray(lengths),
            )
        )
        return [v[i, : self.states_num] for i in range(len(seqs))]
