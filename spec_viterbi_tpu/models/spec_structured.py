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
    """Re-specializable level-L decoder over structured tuple operators."""

    def __init__(self, level: int = 1):
        if level < 1:
            raise ValueError("level must be >= 1 (Viterbi_spec_impl.h:20-23)")
        self.level = level
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

    def run_spec(self, seq: np.ndarray) -> np.ndarray:
        if not self._specialized:
            raise RuntimeError("call spec_with(hmm) before run_spec(seq)")
        seq = jnp.asarray(validate_obs_seq(seq, self.emit_num))
        v = self._decode(seq)
        return np.asarray(v[: self.states_num])
