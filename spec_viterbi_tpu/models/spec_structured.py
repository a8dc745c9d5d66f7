"""Level-L specialization with structured (diag + rank-1) tuple operators.

Same API as :class:`~spec_viterbi_tpu.models.specializer.SpecializedViterbi`
(``spec_with`` / ``run_Viterbi_spec`` parity, ``Viterbi_spec_impl.h:6-24``)
but tuple operators are stored as O(N) component vectors via the tropical
closure in :mod:`spec_viterbi_tpu.ops.structured_compose` — level-L memory
is ``E^L · components · N`` floats instead of the reference's dense
``E^L · N²`` (the wall that limits its GPU backends to level 1,
``bench_Viterbi_spec.h:37-47``). On the Pfam corpus level 2 shrinks from
9.3 GB to ~23 MB.

Decode consumes ``seq[1:]`` in chunks of ``level`` through the composed
components (one gather of a few [N] vectors per chunk instead of one dense
[N,N] matrix), with the reference's tail handling
(``GraphBLAS_spec_impl.cpp:64-89``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spec_viterbi_tpu.hmm import HMM, pad_to_lane, validate_obs_seq
from spec_viterbi_tpu.ops import structured_compose as sc
from spec_viterbi_tpu.ops.structured import StructuredOperator

INF = np.float32(np.inf)


def _split(comps: list, n: int):
    """Component list → (offsets, diag_vals [D,N], u [R,N], w [R,N])."""
    offsets = [c.offset for c in comps if isinstance(c, sc.Diag)]
    dv = np.stack(
        [c.vals for c in comps if isinstance(c, sc.Diag)]
    ) if offsets else np.zeros((0, n), np.float32)
    r1 = [c for c in comps if isinstance(c, sc.Rank1)]
    u = np.stack([c.u for c in r1]) if r1 else np.zeros((0, n), np.float32)
    w = np.stack([c.w for c in r1]) if r1 else np.zeros((0, n), np.float32)
    return offsets, dv, u, w


class StructuredSpecializedViterbi:
    """Re-specializable level-L decoder over structured tuple operators.

    Two decode realizations cross-validate (the reference's multi-backend
    role, ``test_semantic_equality.cpp:19-98``):

    - **composed**: the stored level-L component vectors (diag stacks +
      rank-1 u/w) gathered per tuple index and applied — the direct
      materialization of ``precalc_obs_handlers.at(tuple) ⊗ v``
      (``GraphBLAS_spec_impl.cpp:64-81``). Runs everywhere; the batched
      form gathers per-lane tuples.
    - **fused** (TPU, fused-eligible operators): the tuple operator applied
      in *factored* form — the precomputed level-1 structured operators
      consumed ``level`` symbols per grid step inside the whole-sequence
      Pallas kernel. On TPU the factored form is strictly faster than
      materialized composition: composing squares the dense row/col
      interactions (each level-2 tuple needs two extra full col-reduces
      *plus* their shift/add prep, ~6 VPU passes, to avoid one ~3-pass
      intermediate-carry materialization — see BASELINE.md §"specialization
      analysis"). Factored application is also bit-identical to the
      non-specialized order, so spec-vs-non-spec equality is exact rather
      than ±1.0.
    """

    def __init__(self, level: int = 1, use_pallas: bool | None = None):
        if level < 1:
            raise ValueError("level must be >= 1 (Viterbi_spec_impl.h:20-23)")
        self.level = level
        self._explicit_pallas = use_pallas
        self._specialized = False

    def get_level(self) -> int:
        return self.level

    @staticmethod
    def spec_memory_bytes(states_num: int, emit_num: int, level: int) -> int:
        """Upper-bound estimate: E^L tuples × component vectors × N floats.

        Composed rank-1 counts roughly double per level (measured on the
        Pfam corpus: 7/11/21 stored vectors per tuple at levels 1-3), so
        the per-tuple vector estimate grows with level.
        """
        vectors = 6 * 2 ** (level - 1) + 2
        return (emit_num**level) * vectors * pad_to_lane(states_num) * 4

    def spec_with(self, hmm: HMM) -> None:
        # deleter(); initializer(hmm, level) semantics
        # (GraphBLAS_spec_impl.cpp:45-48): drop previous operators first
        self._specialized = False
        self._fused = None
        n = pad_to_lane(hmm.states_num)
        self.n = n
        self.states_num = hmm.states_num
        self.emit_num = e = hmm.emit_num

        sop = StructuredOperator.from_hmm(hmm, pad_to=n)
        base = sc.from_structured(sop)
        em = hmm.emission_matrix(pad_to=n)
        pi = hmm.start_vector(pad_to=n)

        # per-symbol level-1 operators: emission folds into the dst side
        def sym_op(o):
            out = []
            for c in base:
                if isinstance(c, sc.Diag):
                    out.append(sc.Diag(c.offset, c.vals + em[o]))
                else:
                    out.append(sc.Rank1(c.u + em[o], c.w))
            return [c for c in out if sc._alive(c)]

        level1 = [sym_op(o) for o in range(e)]

        # compose tuples level by level; tuple index is the radix-e encoding
        # with the earliest symbol least significant (specializer.py parity)
        tuples = level1
        for _ in range(self.level - 1):
            nxt = []
            for o in range(e):  # new symbol = most significant digit
                for prev in tuples:
                    nxt.append(sc.compose(level1[o], prev))
            tuples = nxt

        # pad all tuples to a common component schema
        all_offsets = sorted({d for t in tuples for d in _split(t, n)[0]})
        max_r1 = max(
            (sum(isinstance(c, sc.Rank1) for c in t) for t in tuples), default=0
        )
        p = len(tuples)
        dv = np.full((p, len(all_offsets), n), INF, np.float32)
        uu = np.full((p, max_r1, n), INF, np.float32)
        ww = np.full((p, max_r1, n), INF, np.float32)
        for ti, t in enumerate(tuples):
            offs, tdv, tu, tw = _split(t, n)
            for k, d in enumerate(offs):
                dv[ti, all_offsets.index(d)] = tdv[k]
            uu[ti, : tu.shape[0]] = tu
            ww[ti, : tw.shape[0]] = tw

        # level-1 schema for the tail loop
        l1_offsets = sorted({d for t in level1 for d in _split(t, n)[0]})
        l1_r1 = max(sum(isinstance(c, sc.Rank1) for c in t) for t in level1)
        dv1 = np.full((e, len(l1_offsets), n), INF, np.float32)
        uu1 = np.full((e, l1_r1, n), INF, np.float32)
        ww1 = np.full((e, l1_r1, n), INF, np.float32)
        for o, t in enumerate(level1):
            offs, tdv, tu, tw = _split(t, n)
            for k, d in enumerate(offs):
                dv1[o, l1_offsets.index(d)] = tdv[k]
            uu1[o, : tu.shape[0]] = tu
            ww1[o, : tw.shape[0]] = tw

        self.tuple_offsets = tuple(all_offsets)
        self.l1_offsets = tuple(l1_offsets)
        self.num_components = int(dv.shape[1] + uu.shape[1])
        self.arrays = tuple(
            jnp.asarray(a) for a in (dv, uu, ww, dv1, uu1, ww1)
        )
        self.start_ops = jnp.asarray(em + pi[None, :])  # [E, N]
        self._build_decode()

        # TPU + regular operator: factored fused kernel for batched decode
        # (and single-sequence, unless use_pallas=False pins the composed
        # path — the independent implementation tests cross-validate with)
        self._fused = None
        if self._explicit_pallas is not False:
            import jax as _jax

            from spec_viterbi_tpu.ops import fused_pallas

            if _jax.default_backend() == "tpu" and fused_pallas.fused_eligible(sop):
                self._fused = fused_pallas.FusedStructuredDecoder(
                    sop, em, pi, unroll=min(self.level, 2)
                )
        self._specialized = True

    def _build_decode(self):
        tuple_offsets = self.tuple_offsets
        l1_offsets = self.l1_offsets
        level = self.level
        emit_num = self.emit_num
        dv, uu, ww, dv1, uu1, ww1 = self.arrays
        start_ops = self.start_ops

        def apply(offsets, dvals, u, w, v):
            # dvals [D, N], u/w [R, N], v [N]
            out = jnp.full(v.shape, jnp.inf, v.dtype)
            for k, d in enumerate(offsets):
                out = jnp.minimum(out, dvals[k] + jnp.roll(v, d))
            if u.shape[0]:
                dots = jnp.min(w + v[None, :], axis=1)  # [R]
                out = jnp.minimum(out, jnp.min(u + dots[:, None], axis=0))
            return out

        from spec_viterbi_tpu.models.specializer import make_chunked_decode

        self._decode = make_chunked_decode(
            level,
            emit_num,
            start_fn=lambda o, ar: ar[0][o],
            chunk_fn=lambda v, i, ar: apply(tuple_offsets, ar[1][i], ar[2][i], ar[3][i], v),
            tail_fn=lambda v, o, ar: apply(l1_offsets, ar[4][o], ar[5][o], ar[6][o], v),
            operands=(start_ops, dv, uu, ww, dv1, uu1, ww1),
        )

        def apply_batch(offsets, dvb, uub, wwb, v):
            # dvb [B, D, N], uub/wwb [B, R, N] per-lane gathered tuple
            # components; v [N, B] state-major carry
            out = jnp.full(v.shape, jnp.inf, v.dtype)
            for k, d in enumerate(offsets):
                out = jnp.minimum(out, dvb[:, k, :].T + jnp.roll(v, d, axis=0))
            if uub.shape[1]:
                dots = jnp.min(wwb + v.T[:, None, :], axis=2)  # [B, R]
                cand = jnp.min(uub + dots[:, :, None], axis=1)  # [B, N]
                out = jnp.minimum(out, cand.T)
            return out

        @jax.jit
        def decode_batch_uniform(seqs_t, operands):
            """Uniform-length batched chunked decode; seqs_t [T, B] int32.

            The per-chunk tuple index is per-lane ([B]); the chunk applies
            each lane's gathered component vectors — the batched analog of
            ``precalc_obs_handlers.at(tuple)`` (GraphBLAS_spec_impl.cpp:67-81)
            with the same positional chunk/tail split as the scalar path.
            """
            start_ops, dv, uu, ww, dv1, uu1, ww1 = operands
            v = start_ops[seqs_t[0]].T  # [N, B]
            rest = seqs_t[1:]
            t_rest = rest.shape[0]
            n_full = t_rest // level
            tail = t_rest - n_full * level
            if n_full:
                chunks = rest[: n_full * level].reshape(n_full, level, -1)
                radix = emit_num ** jnp.arange(level, dtype=jnp.int32)
                idxs = jnp.sum(chunks * radix[None, :, None], axis=1)  # [n_full, B]
                v, _ = jax.lax.scan(
                    lambda v, i: (
                        apply_batch(tuple_offsets, dv[i], uu[i], ww[i], v),
                        None,
                    ),
                    v,
                    idxs,
                )
            if tail:
                v, _ = jax.lax.scan(
                    lambda v, o: (
                        apply_batch(l1_offsets, dv1[o], uu1[o], ww1[o], v),
                        None,
                    ),
                    v,
                    rest[n_full * level :],
                )
            return v.T

        operands = (start_ops, dv, uu, ww, dv1, uu1, ww1)
        self._decode_batch_uniform = lambda seqs_t: decode_batch_uniform(
            seqs_t, operands
        )

    def run_spec(self, seq: np.ndarray) -> np.ndarray:
        if not self._specialized:
            raise RuntimeError("call spec_with(hmm) before run_spec(seq)")
        if self._fused is not None:
            return self._fused.decode_batch([np.asarray(seq)])[0]
        seq = jnp.asarray(validate_obs_seq(seq, self.emit_num))
        v = self._decode(seq)
        return np.asarray(v[: self.states_num])

    def run_spec_batch(self, seqs: list[np.ndarray]) -> list[np.ndarray]:
        """Batched specialized decode (DP extension of ``run_Viterbi_spec``).

        On TPU with a fused-eligible operator the whole batch rides the
        factored fused kernel (any raggedness handled by per-substep lane
        masks). The composed path needs positionally aligned chunk/tail
        boundaries, so it buckets lanes by exact length and decodes each
        uniform bucket as one device program.
        """
        if not self._specialized:
            raise RuntimeError("call spec_with(hmm) before run_spec_batch")
        if not seqs:
            return []
        if self._fused is not None:
            return self._fused.decode_batch(seqs)
        seqs = [validate_obs_seq(s, self.emit_num) for s in seqs]
        out: list[np.ndarray | None] = [None] * len(seqs)
        by_len: dict[int, list[int]] = {}
        for i, s in enumerate(seqs):
            by_len.setdefault(len(s), []).append(i)
        for _, idxs in sorted(by_len.items()):
            batch = np.stack([seqs[i] for i in idxs], axis=1)  # [T, b]
            v = np.asarray(self._decode_batch_uniform(jnp.asarray(batch)))
            for j, i in enumerate(idxs):
                out[i] = v[j, : self.states_num]
        return out
