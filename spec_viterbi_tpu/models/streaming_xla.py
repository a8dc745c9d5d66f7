"""Universal streaming decode: the XLA structured fallback engine.

The fused Pallas engine (:class:`~spec_viterbi_tpu.ops.fused_pallas.
FusedStructuredDecoder`) requires a fused-eligible operator (residual ≤ 8,
≤ 24 components). This engine implements the SAME streaming protocol
(:class:`~spec_viterbi_tpu.ops.fused_pallas._StreamAPI`: ``stream_begin/
feed/scores``, the ``stream_*_path`` family, ``stream_save/load``) on the
plain XLA structured scan (:func:`~spec_viterbi_tpu.ops.structured.
structured_mv_batch`), which accepts ANY decomposition — arbitrary
residual COO included — so ``ViterbiDecoder.streaming()`` works for every
HMM the parity API accepts (``Viterbi_impl.h:8`` takes whole sequences of
any model; the long-context extension must not be narrower).

Differences from the fused engine, by design:

- the carry lives in true ``+inf`` score space (no MXU, so no ``BIG``
  clamp round-trip);
- path-finalize backpointers are int32 (no 32k-state limit) produced by a
  ``vmap``-over-lanes :func:`structured_mv_argmin` — same lowest-source /
  inf-ties-never-adopt contract, so paths are bit-identical to the oracle;
- stream states are NOT interchangeable with the fused engine's (the
  carry encodings differ); ``_model_key`` is prefixed per engine so a
  cross-engine ``stream_load`` fails loudly instead of corrupting scores.
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from spec_viterbi_tpu.ops.fused_pallas import _StreamAPI
from spec_viterbi_tpu.ops.structured import (
    StructuredOperator,
    structured_mv_argmin,
    structured_mv_batch,
)

SUBLANE = 8  # lane-pad granularity for the scan batch dim


class XLAStreamDecoder(_StreamAPI):
    """Streaming engine on the XLA structured scan; any operator, any backend."""

    # one [T_q, Np, B] int32 backpointer block materializes per finalize
    # chunk; cap it like the fused engine caps its int16 tensor
    MAX_PATH_BYTES = 6 << 30

    def __init__(self, sop: StructuredOperator, emissions: np.ndarray, pi: np.ndarray):
        self.sop = sop
        self.n = sop.n
        self.states_num = sop.states_num
        self.emit_num = int(emissions.shape[0])
        self._arrs = sop.device_arrays()
        self.em_t = jnp.asarray(np.asarray(emissions).T)  # [Np, E]
        self.pi = jnp.asarray(pi)
        self._sym_dtype = np.int8 if self.emit_num <= 127 else np.int32

        # same content fingerprint as the fused engine (values AND
        # structure), prefixed so cross-engine loads are rejected: the two
        # carry encodings (+inf vs BIG-clamped) are not interchangeable
        h = hashlib.sha1(b"xla-stream|")
        for a in (
            np.asarray(emissions), np.asarray(pi),
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

        # operator/emission arrays are threaded through jit as ARGUMENTS,
        # not closure constants (closure constants ship to the remote
        # compiler — CLAUDE.md); only the static index structure closes over
        em_t, pi_d, arrs = self.em_t, self.pi, self._arrs

        @jax.jit
        def begin(em_t, pi_d, syms):
            b = syms.shape[0]
            b_pad = -(-b // SUBLANE) * SUBLANE
            syms = jnp.pad(syms, (0, b_pad - b))
            return em_t[:, syms] + pi_d[:, None]

        @jax.jit
        def feed(em_t, arrs, carry, syms, lengths):
            def step(v, xs):
                o, t = xs
                u = structured_mv_batch(sop, arrs, v)
                v_new = em_t[:, o] + u
                keep = ((t + 1) < lengths[0])[None, :]
                return jnp.where(keep, v_new, v), None

            obs = syms.astype(jnp.int32)
            ts = jnp.arange(obs.shape[0])
            v, _ = jax.lax.scan(step, carry, (obs, ts))
            return v

        @jax.jit
        def last(carry):
            # per-lane argmin end state; jnp.argmin ties -> lowest index,
            # all-inf lanes -> 0 (oracle contract)
            return jnp.argmin(carry, axis=0).astype(jnp.int32)[None, :]

        mv_argmin = jax.vmap(
            lambda arrs, vv: structured_mv_argmin(sop, arrs, vv),
            in_axes=(None, 1),
            out_axes=1,
        )

        @functools.partial(jax.jit, static_argnames=("b_real",))
        def path_block(em_t, arrs, carry, chunk, lengths, boundary, *, b_real: int):
            """One finalize block (the fused ``_path_block`` contract):
            rematerialize this chunk's backpointers from its checkpoint,
            backtrace from ``boundary`` (state at the chunk's end), return
            (piece [T_q, b_real] — states at positions p+1..p+T_q, pad
            steps repeating the boundary via identity pointers — and the
            new boundary rev[0] = state at position p)."""
            obs = chunk.astype(jnp.int32)
            n = carry.shape[0]
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

            def step(v, xs):
                o, t = xs
                u, src = mv_argmin(arrs, v)  # [Np, B] each
                v_new = em_t[:, o] + u
                keep = ((t + 1) < lengths[0])[None, :]
                # frozen steps store identity pointers: backtrace through
                # padding is a no-op
                return jnp.where(keep, v_new, v), jnp.where(keep, src, iota)

            ts = jnp.arange(obs.shape[0])
            _, srcs = jax.lax.scan(step, carry, (obs, ts))  # [T_q, Np, B]

            def back(state, src_t):  # state [1, B]
                prev = jnp.take_along_axis(src_t, state, axis=0)
                return prev, prev

            _, rev = jax.lax.scan(back, boundary, srcs, reverse=True)
            rev = rev[:, 0, :]  # [T_q, B]: rev[t] = state at position p+t
            piece = jnp.concatenate([rev[1:], boundary], axis=0)
            return piece[:, :b_real], rev[0:1]

        self._jit_begin = lambda syms: begin(em_t, pi_d, syms)
        self._jit_feed = lambda carry, syms, ln: feed(em_t, arrs, carry, syms, ln)
        # jitted: eager transpose/slice would cost one ~25 ms tunnel
        # dispatch EACH on a tunneled deployment
        self._jit_extract = jax.jit(self._extract, static_argnames=("b_real",))
        self._jit_last = last
        self._jit_path_block = lambda ck, ch, ln, bd, b_real: path_block(
            em_t, arrs, ck, ch, ln, bd, b_real=b_real
        )

    def _extract(self, carry, b_real: int | None = None):
        out = carry.T  # already true +inf space
        if b_real is not None:
            out = out[:b_real]
        return out[:, : self.states_num]  # same [B, states_num] as fused

    def path_supported(self, t_max: int, batch: int = SUBLANE) -> bool:
        """Whether one finalize block of this shape fits the pointer budget."""
        b_pad = -(-batch // SUBLANE) * SUBLANE
        return max(0, t_max - 1) * self.n * b_pad * 4 <= self.MAX_PATH_BYTES
