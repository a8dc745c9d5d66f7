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


# --------------------------------------------------------------------------
# Batched (array-form) composition: the production build path.
#
# The pairwise compose()/compose_pair() API above operates on one component
# at a time (kept for tests and algebra clarity). Building level-L stacks
# with it costs ~E^L · |A|·|B| tiny NumPy calls (616k at level 3 on the
# Pfam corpus → 53 s, VERDICT r1 #5). The batched form keeps every level as
# padded arrays — diag stack [P, D, N] + rank-1 stacks [P, R, N] — and
# composes all P tuples per new symbol in whole-array ops. Slot structure
# replaces the per-instance point-w merge: a composed level has
#   diags:  {d_a + d_b} (min-merged by offset)
#   rank1s: the B slots (w inherited; u min-merged over every A component
#           that lands there) + one slot per (A-rank1 × B-diag) product,
# so the slot count grows LINEARLY per level (R' = R_b + Ra·Db), better
# than the ~2× growth of the instance-merged form.
# --------------------------------------------------------------------------


def batched_level1(sop: StructuredOperator, em: np.ndarray):
    """Level-1 operator stack in array form, emissions folded into dst.

    Returns ``(offsets, dv [E, D, N], uu [E, R, N], ww [E, R, N])`` where
    slot order is rows, cols, residual entries (``from_structured`` order).
    Dead symbols keep their (all-inf) slots so every symbol shares one
    schema — required for the vectorized level step.
    """
    base = from_structured(sop)
    diags = [c for c in base if isinstance(c, Diag)]
    r1s = [c for c in base if isinstance(c, Rank1)]
    e, n = em.shape
    offsets = tuple(c.offset for c in diags)
    with np.errstate(invalid="ignore"):
        if diags:
            dv = np.stack([c.vals for c in diags])[None] + em[:, None, :]
        else:
            dv = np.zeros((e, 0, n), np.float32)
        if r1s:
            uu = np.stack([c.u for c in r1s])[None] + em[:, None, :]
            ww = np.broadcast_to(
                np.stack([c.w for c in r1s])[None], (e, len(r1s), n)
            ).copy()
        else:
            uu = np.zeros((e, 0, n), np.float32)
            ww = np.zeros((e, 0, n), np.float32)
    return offsets, dv.astype(np.float32), uu.astype(np.float32), ww


def _shift_dst_batch(x: np.ndarray, d: int) -> np.ndarray:
    """Batched ``_shift_dst`` along the last axis: out[..., i] = x[..., i−d]."""
    n = x.shape[-1]
    out = np.full_like(x, INF)
    if d == 0:
        return x.copy()
    if d > 0:
        out[..., d:] = x[..., : n - d]
    else:
        out[..., : n + d] = x[..., -d:]
    return out


def _any_finite(x: np.ndarray) -> bool:
    """Early-exit finiteness scan over the leading axis (alive slots hit
    a finite value in the first slice; only dead slots scan fully)."""
    for ei in range(x.shape[0]):
        if np.isfinite(x[ei]).any():
            return True
    return False


def batched_compose_level(l1, prev, threads: int | None = None):
    """One ``add_level`` step in array form: all E symbols × all P tuples.

    ``l1 = (offsets_a, adv [E,Da,N], auu [E,Ra,N], aww [E,Ra,N])`` is the
    level-1 stack; ``prev = (offsets_b, bdv [P,Db,N], buu [P,Rb,N],
    bww [P,Rb,N])`` the previous level. Output tuple index is ``p + o·P``
    (new symbol = most-significant radix digit, matching
    ``GraphBLAS_spec_impl.cpp:15-36`` and the scalar path). All-inf diag
    offsets and rank-1 slots are pruned globally.

    The slot schema is known a priori, so outputs are preallocated
    ``[E, P, slots, N]`` slabs filled by a thread pool over P-chunks with
    ``out=``-parameter ufuncs (NumPy releases the GIL on large arrays) —
    the level-3 Pfam step runs at memory bandwidth across cores instead of
    single-threaded with temporaries.
    """
    import concurrent.futures
    import os as _os

    offs_a, adv, auu, aww = l1
    offs_b, bdv, buu, bww = prev
    e, _, n = adv.shape
    p = bdv.shape[0]
    ra = auu.shape[1]
    rb = buu.shape[1]

    out_offsets = sorted({d_a + d_b for d_a in offs_a for d_b in offs_b})
    dc = len(out_offsets)
    rc = rb + ra * len(offs_b)
    # np.empty everywhere: INF-init happens inside the threaded fill so
    # first-touch page faults spread across the pool (this VM faults fresh
    # pages slowly; single-threaded init dominated the level-3 build)
    dv_out = np.empty((e, p, dc, n), np.float32)
    uu_out = np.empty((e, p, rc, n), np.float32)
    ww_out = np.empty((e, p, rc, n), np.float32)

    # shifted B stacks shared across symbols and chunks
    shifted_bdv = {d_a: _shift_dst_batch(bdv, d_a) for d_a in set(offs_a)}
    shifted_buu = {d_a: _shift_dst_batch(buu, d_a) for d_a in set(offs_a)}

    def fill(p0: int, p1: int) -> None:
        sl = slice(p0, p1)
        buf = np.empty((e, p1 - p0, n), np.float32)
        dv_out[:, sl] = INF
        uu_out[:, sl, :rb, :] = INF  # group-1 slots accumulate via minimum
        with np.errstate(invalid="ignore"):
            # diagonals: Diag(d_a) ⊗ Diag(d_b) → Diag(d_a+d_b), min-merged
            for ka, d_a in enumerate(offs_a):
                for kb, d_b in enumerate(offs_b):
                    np.add(
                        adv[:, None, ka, :],
                        shifted_bdv[d_a][None, sl, kb, :],
                        out=buf,
                    )
                    slot = out_offsets.index(d_a + d_b)
                    np.minimum(
                        dv_out[:, sl, slot, :], buf, out=dv_out[:, sl, slot, :]
                    )
            # group 1: w inherited from B slot r; u min-merged over every
            # A component landing there (diag shifts + rank-1 dots)
            for r in range(rb):
                acc = uu_out[:, sl, r, :]
                for ka, d_a in enumerate(offs_a):
                    np.add(
                        adv[:, None, ka, :],
                        shifted_buu[d_a][None, sl, r, :],
                        out=buf,
                    )
                    np.minimum(acc, buf, out=acc)
                for a in range(ra):
                    np.add(aww[:, None, a, :], buu[None, sl, r, :], out=buf)
                    dot = buf.min(axis=-1)  # [E, pc]
                    np.add(auu[:, None, a, :], dot[:, :, None], out=buf)
                    np.minimum(acc, buf, out=acc)
                ww_out[:, sl, r, :] = bww[None, sl, r, :]
            # group 2: Rank1(a) ⊗ Diag(d_b) → Rank1(a.u, shift(a.w+b.vals))
            slot = rb
            for a in range(ra):
                for kb, d_b in enumerate(offs_b):
                    np.add(aww[:, None, a, :], bdv[None, sl, kb, :], out=buf)
                    ww_out[:, sl, slot, :] = _shift_dst_batch(buf, -d_b)
                    uu_out[:, sl, slot, :] = auu[:, None, a, :]
                    slot += 1

    nt = threads or min(4, _os.cpu_count() or 1)
    if nt > 1 and p >= 2 * nt:
        bounds = np.linspace(0, p, nt + 1, dtype=int)
        with concurrent.futures.ThreadPoolExecutor(max_workers=nt) as pool:
            list(pool.map(lambda i: fill(bounds[i], bounds[i + 1]), range(nt)))
    else:
        fill(0, p)

    # global all-inf pruning (early-exit scans; only dead slots pay)
    keep_d = [k for k in range(dc) if _any_finite(dv_out[:, :, k, :])]
    keep_r = [
        r
        for r in range(rc)
        if _any_finite(uu_out[:, :, r, :]) and _any_finite(ww_out[:, :, r, :])
    ]
    new_offsets = tuple(out_offsets[k] for k in keep_d)
    dv = dv_out.reshape(e * p, dc, n)
    uu = uu_out.reshape(e * p, rc, n)
    ww = ww_out.reshape(e * p, rc, n)
    if len(keep_d) != dc:
        dv = np.ascontiguousarray(dv[:, keep_d, :])
    if len(keep_r) != rc:
        uu = np.ascontiguousarray(uu[:, keep_r, :])
        ww = np.ascontiguousarray(ww[:, keep_r, :])
    return new_offsets, dv, uu, ww


def batched_levels(sop: StructuredOperator, em: np.ndarray, level: int):
    """Level-1 … level-L stacks in array form; returns (l1, lL)."""
    l1 = batched_level1(sop, em)
    cur = l1
    for _ in range(level - 1):
        cur = batched_compose_level(l1, cur)
    return l1, cur


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
