"""Time-parallel single-sequence decode via the structured closure.

The fused kernel's serving throughput comes from lane occupancy: a batch
fills 128-lane blocks, but a SINGLE sequence occupies one lane and decodes
at ~1/170 of the headline (BASELINE.md). This module attacks that hole by
mapping TIME BLOCKS of one sequence onto lanes:

1. **Compose** (parallel over blocks): split the T−1 recurrence steps into
   ``nb = (T−1)//k`` blocks of ``k`` symbols and build each block's
   composed operator ``M_block = M_{o_k} ⊗ … ⊗ M_{o_1}`` in the
   banded+low-rank closure of :mod:`spec_viterbi_tpu.ops.structured_compose`
   (``README.md:9-13`` associativity — the same algebra the reference's
   specializer exploits per alphabet tuple, applied across *time* of one
   concrete sequence). For a single-diagonal operator (the Pfam match
   chain) the composed block stays ONE diagonal (offset ``k·d``) plus
   ``R1·k`` rank-1 slots — linear growth (``R' = R_b + R_a·D_a``), never
   densifying. All ``nb`` blocks compose together as array ops over a
   ``[nb, slots, N]`` layout — the lanes-as-time-blocks trick.
2. **Fold** (sequential, short): apply the ``nb`` block operators to the
   frontier in order — ``nb`` applies of O(R1·k·N) work instead of ``T``
   dependent steps. The frontier before each block is retained.
3. **Tail**: the ``(T−1) mod k`` leftover symbols run serially.
4. **Paths** (optional): rematerialize every block's backpointers in ONE
   batched pass — block b decodes from its retained frontier on lane b
   (the checkpoint/rematerialize trade of the streaming engine, applied
   across time blocks instead of stream chunks) — then backtrace across
   block boundaries.

Work accounting (the go/no-go law): compose does ``Σ_t O(R1·t·N) ≈
O(R1·k²/2·N)`` per block — ``O(R1·k·T·N/2)`` total, but data-parallel
over ``nb`` lanes — while fold is ``O(R1·T·N)`` sequential-in-``nb`` with
k-fold fewer dependent steps than serial decode. Serial decode is
``O(C·T·N)`` with T dependent steps. Time-parallel wins when the machine
has idle lanes (it does: 1 used of 128) and k is small enough that the
quadratic compose term stays below the lane count. Measured numbers live
in BASELINE.md.

Exactness: real-arithmetic scores are identical to serial decode (min
distributes over ⊗; every path's weight is the same sum). Float addition
association differs (operator values pre-combine before meeting the
frontier), so scores can drift by ulps relative to the serial kernel —
within the reference's ±1.0 contract (``HMM.h:43-49``), like the
reference's own specialization. Paths are rematerialized with the exact
serial per-step rules from the composed frontiers, so a path can differ
from the oracle only if an ulp drift crosses an argmin tie; the test
suite and the corpus sweep measure this (zero observed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spec_viterbi_tpu.hmm import validate_obs_seq
from spec_viterbi_tpu.ops.structured import StructuredOperator, structured_mv
from spec_viterbi_tpu.ops.structured_compose import batched_level1

INF = np.float32(np.inf)


def time_parallel_supported(sop: StructuredOperator) -> bool:
    """The closure keeps ONE diagonal slot only when the operator has one
    diagonal component; multi-diag operators would grow a band (offsets
    {Σ choices}) — representable but not implemented here."""
    return len(sop.diag_offsets) == 1


def _shift(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """out[..., i] = x[..., i−d], +inf fill (``_shift_dst`` in jnp)."""
    if d == 0:
        return x
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1)
    if d > 0:
        return jnp.pad(
            x[..., : n - d], pad + [(d, 0)], constant_values=jnp.inf
        )
    return jnp.pad(x[..., -d:], pad + [(0, -d)], constant_values=jnp.inf)


class TimeParallelDecoder:
    """Single-sequence decoder that trades lane occupancy for latency."""

    def __init__(self, sop: StructuredOperator, emissions, pi, k: int = 8):
        if not time_parallel_supported(sop):
            raise ValueError("time-parallel decode needs a single-diagonal operator")
        self.sop = sop
        self.k = int(k)
        self.n = sop.n
        self.states_num = sop.states_num
        self.emit_num = int(np.asarray(emissions).shape[0])
        self.d = sop.diag_offsets[0]
        offsets, dv1, uu1, ww1 = batched_level1(sop, np.asarray(emissions))
        assert offsets == (self.d,)
        self.r1 = uu1.shape[1]  # rank-1 slots per level-1 operator
        self._dv1 = jnp.asarray(dv1[:, 0, :])  # [E, N]
        self._uu1 = jnp.asarray(uu1)  # [E, R1, N]
        self._ww1 = jnp.asarray(ww1)  # [E, R1, N]
        self._em_t = jnp.asarray(np.asarray(emissions).T)  # [N, E]
        self._pi = jnp.asarray(np.asarray(pi))
        self._arrs = sop.device_arrays()
        self._jit_compose = jax.jit(self._compose)
        self._jit_fold = jax.jit(self._fold)
        self._jit_tail = jax.jit(self._tail)

        # path-remat jits are built ONCE here: defining them per decode_path
        # call would create fresh function objects and re-trace/re-compile
        # every call (seconds per remote compile on a tunneled deployment)
        from spec_viterbi_tpu.ops.structured import structured_mv_argmin

        mv_argmin = jax.vmap(
            lambda arrs, vv: structured_mv_argmin(sop, arrs, vv),
            in_axes=(None, 1),
            out_axes=1,
        )

        @jax.jit
        def block_srcs(em_t, arrs, fronts_t, syms_t):
            """fronts_t [N, nb] lane-major frontiers; syms_t [k, nb] →
            (carry [N, nb], srcs [k, N, nb])."""

            def step(vv, o):
                u, src = mv_argmin(arrs, vv)
                return em_t[:, o] + u, src

            return jax.lax.scan(step, fronts_t, syms_t)

        self._jit_block_srcs = lambda fronts_t, syms_t: block_srcs(
            self._em_t, self._arrs, fronts_t, syms_t
        )

        @jax.jit
        def back(last, srcs_all):
            def bstep(state, src_t):
                prev = src_t[state]
                return prev, prev

            _, rev = jax.lax.scan(bstep, last, srcs_all, reverse=True)
            return rev

        self._jit_back = back

    # ---- phase 1: block-operator composition (lanes = time blocks) ------

    def _compose(self, dv1, uu1, ww1, syms):
        """syms [nb, k] → block operators (dv [nb, N], uu/ww [nb, R1·k, N]).

        Per step the closure product rules (structured_compose module
        docstring) with A = this step's level-1 operator, B = the running
        block operator: Diag⊗Diag stays the single diagonal; inherited
        rank-1 slots keep their w and min-merge their u over A's diagonal
        shift and A's rank-1 dots; A's R1 rank-1 components spawn R1 new
        slots against B's diagonal. Slot count after k steps: R1·k.
        """
        d, k = self.d, self.k
        acc_dv = dv1[syms[:, 0]]  # [nb, N]
        acc_u = uu1[syms[:, 0]]  # [nb, R1, N]
        acc_w = ww1[syms[:, 0]]
        for t in range(1, k):
            a_dv = dv1[syms[:, t]]  # [nb, N]
            a_u = uu1[syms[:, t]]  # [nb, R1, N]
            a_w = ww1[syms[:, t]]
            # Diag ⊗ Diag
            new_dv = a_dv + _shift(acc_dv, d)
            # inherited slots: Diag(a) ⊗ Rank1(b)  ∪  Rank1(a) ⊗ Rank1(b)
            u_diag = a_dv[:, None, :] + _shift(acc_u, d)  # [nb, S, N]
            dots = jnp.min(
                a_w[:, :, None, :] + acc_u[:, None, :, :], axis=-1
            )  # [nb, R1, S]
            u_rank = jnp.min(
                a_u[:, :, None, :] + dots[:, :, :, None], axis=1
            )  # [nb, S, N]
            acc_u = jnp.minimum(u_diag, u_rank)
            # new slots: Rank1(a) ⊗ Diag(b, offset t·d)
            w_new = _shift(a_w + acc_dv[:, None, :], -(t * d))
            acc_u = jnp.concatenate([acc_u, a_u], axis=1)
            acc_w = jnp.concatenate([acc_w, w_new], axis=1)
            acc_dv = new_dv
        return acc_dv, acc_u, acc_w

    # ---- phase 2: sequential fold over block operators ------------------

    def _fold(self, v0, acc_dv, acc_u, acc_w):
        """Apply nb block operators in order; returns (v_final, frontiers)
        with frontiers[b] = carry BEFORE block b (for path remat)."""
        kd = self.k * self.d

        def step(v, op):
            dv_b, u_b, w_b = op
            diag = dv_b + _shift(v, kd)
            dots = jnp.min(w_b + v[None, :], axis=-1)  # [S]
            cand = jnp.min(u_b + dots[:, None], axis=0)  # [N]
            return jnp.minimum(diag, cand), v

        v, frontiers = jax.lax.scan(step, v0, (acc_dv, acc_u, acc_w))
        return v, frontiers

    def _tail(self, v, syms):
        def step(v, o):
            return self._em_t[:, o] + structured_mv(self.sop, self._arrs, v), None

        v, _ = jax.lax.scan(step, v, syms)
        return v

    # ---- public API -----------------------------------------------------

    def plan(self, t: int) -> tuple[int, int]:
        """(full blocks, tail steps) for a T-symbol sequence."""
        nb = (t - 1) // self.k
        return nb, (t - 1) - nb * self.k

    def decode(self, seq: np.ndarray) -> np.ndarray:
        """Final score vector; time-parallel compose + fold + serial tail."""
        v, _, _, _, _ = self._decode_parts(seq)
        return np.asarray(v)[: self.states_num]

    def _decode_parts(self, seq: np.ndarray):
        seq = validate_obs_seq(seq, self.emit_num)
        t = len(seq)
        nb, tail = self.plan(t)
        seq_d = jnp.asarray(seq)
        v = self._em_t[:, seq_d[0]] + self._pi
        frontiers = None
        if nb:
            syms = seq_d[1 : 1 + nb * self.k].reshape(nb, self.k)
            ops = self._jit_compose(self._dv1, self._uu1, self._ww1, syms)
            v, frontiers = self._jit_fold(v, *ops)
        v_blocks = v  # carry after all full blocks, before the tail
        if tail:
            v = self._jit_tail(v, seq_d[1 + nb * self.k :])
        return v, frontiers, v_blocks, nb, tail

    def decode_path(self, seq: np.ndarray, engine=None):
        """(scores, path) — exact per-step rules rematerialized per block.

        ``engine``: a FusedStructuredDecoder for this operator (TPU path
        kernel); defaults to a vmapped XLA argmin pass. Blocks decode in
        ONE batched pass from their retained frontiers (lane b = block b),
        then the backtrace threads block boundaries in reverse.
        """
        seq = validate_obs_seq(seq, self.emit_num)
        t = len(seq)
        v, frontiers, v_blocks, nb, tail = self._decode_parts(seq)
        scores = np.asarray(v)

        # per-step argmin pointers for the tail + blocks, then backtrace
        seq_d = jnp.asarray(seq)
        n = self.n
        block_srcs = self._jit_block_srcs

        pieces = []
        if nb:
            syms = np.asarray(seq[1 : 1 + nb * self.k]).reshape(nb, self.k)
            if engine is not None and n <= np.iinfo(np.int16).max:
                obs = jnp.asarray(syms.T)[:, None, :]  # [k, 1, nb]
                b_pad = -(-nb // 128) * 128
                fronts = jnp.pad(
                    frontiers.T, ((0, 0), (0, b_pad - nb)), constant_values=jnp.inf
                )
                obs = jnp.pad(obs, ((0, 0), (0, 0), (0, b_pad - nb)))
                lengths = jnp.full((1, b_pad), self.k + 1, jnp.int32)
                # engine carry space is BIG-clamped; frontiers are +inf
                # space — clamp going in, kernel treats ≥ threshold as inf
                from spec_viterbi_tpu.ops.fused_pallas import BIG

                fronts = jnp.minimum(fronts, BIG)
                _, srcs = engine._path_pallas(fronts, obs, lengths, masked=False)
                srcs = srcs[:, :, :nb].astype(jnp.int32)  # [k, N, nb]
            else:
                _, srcs = block_srcs(frontiers.T, jnp.asarray(syms.T))
            # reorder to time order: step j of block b = global step b·k+j
            srcs_time = jnp.transpose(srcs, (2, 0, 1)).reshape(nb * self.k, n)
            pieces.append(srcs_time)
        if tail:
            tail_syms = seq_d[1 + nb * self.k :]
            _, tsrcs = block_srcs(v_blocks[:, None], tail_syms[:, None])
            pieces.append(tsrcs[:, :, 0])
        if pieces:
            srcs_all = jnp.concatenate(pieces, axis=0)  # [T-1, N]
            last = jnp.argmin(jnp.asarray(scores)).astype(jnp.int32)
            rev = self._jit_back(last, srcs_all)
            path = np.concatenate([np.asarray(rev), [int(last)]])
        else:
            path = np.array([int(np.argmin(scores))])
        return scores[: self.states_num], path.astype(np.int32)
