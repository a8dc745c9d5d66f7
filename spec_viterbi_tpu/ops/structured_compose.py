"""Tropical composition of structured operators — level-L specialization
WITHOUT densification.

The reference's level-L specialization materializes ``emit_num^L`` dense
N×N tuple operators (``GraphBLAS_spec_impl.cpp:15-36``) — 9.3 GB at level 2
on the 20-symbol corpus, which is why its GPU backends stop at level 1
(``bench_Viterbi_spec.h:37-47``). This module removes that wall: the
structured component family

- ``DIAG(d, vals)``   : M[i, i−d] = vals[i]
- ``RANK1(u, w)``     : M[i, j] = u[i] + w[j]   (tropical outer product)

is **closed under (min,+) matrix products**:

    DIAG(d1,a) ⊗ DIAG(d2,b)   = DIAG(d1+d2, a[i] + b[i−d1])
    DIAG(d,a)  ⊗ RANK1(u,w)   = RANK1(a + shift(u, d), w)
    RANK1(u,w) ⊗ DIAG(d,b)    = RANK1(u, shift(w+b, −d))
    RANK1(u1,w1) ⊗ RANK1(u2,w2) = RANK1(u1 + (w1 ⊙ u2), w2)   (scalar dot)

so a length-L tuple operator ``M_{o_L} ⊗ … ⊗ M_{o_1}`` is again a small sum
(tropical min) of diagonals and rank-1 terms, each stored as O(N) vectors:
level-L memory is ``E^L · (#components) · N`` floats instead of
``E^L · N²``. Dense rows (w = point), dense columns (u = point), and
residual COO entries are all RANK1 specializations, so every
`StructuredOperator` converts losslessly.

Components whose value vectors are entirely +inf are pruned (most cross
products die this way), and near-point rank-1 terms stay cheap to apply.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from spec_viterbi_tpu.ops.structured import StructuredOperator

INF = np.float32(np.inf)


@dataclasses.dataclass(frozen=True)
class Diag:
    offset: int
    vals: np.ndarray  # [N], vals[i] = M[i, i-offset]


@dataclasses.dataclass(frozen=True)
class Rank1:
    u: np.ndarray  # [N]
    w: np.ndarray  # [N]; M[i, j] = u[i] + w[j]


def _point(n: int, idx: int, val: float = 0.0) -> np.ndarray:
    v = np.full(n, INF, dtype=np.float32)
    v[idx] = val
    return v


def _shift_dst(vec: np.ndarray, d: int) -> np.ndarray:
    """out[i] = vec[i−d], out-of-range = +inf."""
    n = vec.shape[0]
    out = np.full(n, INF, dtype=np.float32)
    if d >= 0:
        out[d:] = vec[: n - d] if d else vec
    else:
        out[: n + d] = vec[-d:]
    return out


def from_structured(sop: StructuredOperator) -> list:
    """Convert a StructuredOperator's components to [Diag | Rank1]."""
    comps: list = []
    for k, d in enumerate(sop.diag_offsets):
        comps.append(Diag(d, sop.diag_vals[k].astype(np.float32)))
    n = sop.n
    for k, s in enumerate(sop.row_idx):
        comps.append(Rank1(sop.row_vals[k].astype(np.float32), _point(n, s)))
    for k, c in enumerate(sop.col_idx):
        comps.append(Rank1(_point(n, c), sop.col_vals[k].astype(np.float32)))
    for s, dst, v in zip(sop.res_src, sop.res_dst, sop.res_vals):
        comps.append(Rank1(_point(n, int(dst), float(v)), _point(n, int(s))))
    return comps


def _alive(c) -> bool:
    if isinstance(c, Diag):
        return bool(np.any(np.isfinite(c.vals)))
    return bool(np.any(np.isfinite(c.u))) and bool(np.any(np.isfinite(c.w)))


def compose_pair(a, b):
    """Component product ``a ⊗ b`` (apply b first, then a); None if dead."""
    if isinstance(a, Diag) and isinstance(b, Diag):
        vals = a.vals + _shift_dst(b.vals, a.offset)
        out = Diag(a.offset + b.offset, vals)
    elif isinstance(a, Diag):
        out = Rank1(a.vals + _shift_dst(b.u, a.offset), b.w)
    elif isinstance(b, Diag):
        # (R1 ⊗ D)[i,j] = u[i] + min_k (w[k] + [k-d == j] b[k])
        #              = u[i] + w[j+d] + b[j+d]
        out = Rank1(a.u, _shift_dst(a.w + b.vals, -b.offset))
    else:
        with np.errstate(invalid="ignore"):
            dot = float(np.min(a.w + b.u))
        if not np.isfinite(dot):
            return None
        out = Rank1(a.u + np.float32(dot), b.w)
    return out if _alive(out) else None


def compose(ops_a: list, ops_b: list, merge: bool = True) -> list:
    """All pairwise products, pruned; ``M_A ⊗ M_B`` as a component list."""
    out: list = []
    for a in ops_a:
        for b in ops_b:
            c = compose_pair(a, b)
            if c is not None:
                out.append(c)
    return _merge(out) if merge else out


def _merge(comps: list) -> list:
    """Cheap consolidations: equal-offset diagonals min together; rank-1
    terms sharing a point-w (same source column) min their u vectors."""
    if not comps:
        return []  # a fully annihilated product (e.g. a dead symbol)
    diags: dict[int, np.ndarray] = {}
    rank1s: list[Rank1] = []
    for c in comps:
        if isinstance(c, Diag):
            if c.offset in diags:
                diags[c.offset] = np.minimum(diags[c.offset], c.vals)
            else:
                diags[c.offset] = c.vals
        else:
            rank1s.append(c)

    # group point-w rank1s by source index (dense-row-like terms)
    by_src: dict[int, np.ndarray] = {}
    rest: list[Rank1] = []
    for c in rank1s:
        finite = np.isfinite(c.w)
        if finite.sum() == 1:
            s = int(np.nonzero(finite)[0][0])
            u = c.u + c.w[s]
            by_src[s] = np.minimum(by_src[s], u) if s in by_src else u
        else:
            rest.append(c)

    out: list = [Diag(d, v) for d, v in sorted(diags.items())]
    n = next(iter(diags.values())).shape[0] if diags else (
        rest[0].u.shape[0] if rest else next(iter(by_src.values())).shape[0]
    )
    out += [Rank1(u, _point(n, s)) for s, u in sorted(by_src.items())]
    out += rest
    return [c for c in out if _alive(c)]


def apply_components(comps: list, v: np.ndarray) -> np.ndarray:
    """NumPy oracle apply: ``u[i] = min over components`` (for tests)."""
    n = v.shape[0]
    out = np.full(n, INF, dtype=np.float32)
    for c in comps:
        if isinstance(c, Diag):
            cand = c.vals + _shift_dst(v, c.offset)
        else:
            with np.errstate(invalid="ignore"):
                dot = np.min(c.w + v)
            cand = c.u + dot if np.isfinite(dot) else np.full(n, INF, np.float32)
        out = np.minimum(out, cand)
    return out


def to_dense(comps: list, n: int) -> np.ndarray:
    """Dense [N, N] TN matrix of a component list (for tests)."""
    m = np.full((n, n), INF, dtype=np.float32)
    for c in comps:
        if isinstance(c, Diag):
            for i in range(n):
                j = i - c.offset
                if 0 <= j < n and np.isfinite(c.vals[i]):
                    m[i, j] = min(m[i, j], c.vals[i])
        else:
            with np.errstate(invalid="ignore"):
                m = np.minimum(m, c.u[:, None] + c.w[None, :])
    return m
