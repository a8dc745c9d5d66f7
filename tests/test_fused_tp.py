"""Chunked-halo fused-kernel TP (banded operators) vs the unsharded kernel
and the NumPy oracle on the virtual CPU mesh (pallas interpret mode).

The interior-row exactness argument (dependency cone ⊆ halo; see
``parallel/fused_tp.py``) predicts BIT-identical scores to the unsharded
fused kernel — the tests assert exact equality, not ±1.0."""

import os

import numpy as np
import pytest

from spec_viterbi_tpu.hmm import HMM, almost_equal_vec, to_modified_prob_np
from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle
from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.parallel import make_mesh
from spec_viterbi_tpu.parallel.fused_tp import FusedTPDecoder, fused_tp_supported


def banded_hmm(n=256, offsets=(1,), emit=4, seed=0):
    """Random banded HMM: transitions only along the given diagonals."""
    rng = np.random.default_rng(seed)
    rows, cols, probs = [], [], []
    for d in offsets:
        src = np.arange(max(0, -d), n - max(0, d))
        rows.append(src)
        cols.append(src + d)
        probs.append(rng.uniform(0.05, 1.0, size=src.shape[0]))
    rows, cols = np.concatenate(rows), np.concatenate(cols)
    probs = np.concatenate(probs)
    return HMM(
        states_num=n,
        emit_num=emit,
        trans_rows=rows.astype(np.int64),
        trans_cols=cols.astype(np.int64),
        trans_probs=to_modified_prob_np(probs),
        emissions=to_modified_prob_np(rng.uniform(0.05, 1.0, size=(emit, n))),
        start_probabilities_cols=np.arange(8, dtype=np.int64),
        start_probabilities=to_modified_prob_np(np.full(8, 1 / 8)),
    )


def _sop(hmm):
    # default detection: full-length bands become diagonals, per-state
    # degree stays below the dense threshold -> purely banded decomposition
    return StructuredOperator.from_hmm(hmm)


@pytest.mark.parametrize(
    "offsets,chunk,shards",
    [((1,), 8, 2), ((1,), 16, 4), ((-1, 1), 8, 2), ((0, 2), 4, 4), ((-3,), 8, 2)],
)
def test_fused_tp_matches_unsharded_kernel(offsets, chunk, shards):
    hmm = banded_hmm(n=256, offsets=offsets, seed=sum(abs(d) for d in offsets))
    sop = _sop(hmm)
    assert not sop.row_idx and not sop.col_idx and sop.residual_nnz == 0
    assert fused_tp_supported(sop, shards, chunk)
    mesh = make_mesh(state=shards)
    n = sop.n
    em = hmm.emission_matrix(pad_to=n)
    pi = hmm.start_vector(pad_to=n)
    tp = FusedTPDecoder(sop, em, pi, mesh, chunk=chunk, interpret=True)
    fd = FusedStructuredDecoder(sop, em, pi, interpret=True)

    rng = np.random.default_rng(7)
    # ragged lengths incl. non-multiple-of-chunk tails
    seqs = [
        rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
        for t in (2, chunk, chunk + 1, 3 * chunk - 1, 40)
    ]
    got = tp.decode_batch(seqs)
    want = fd.decode_batch(seqs, bucketed=False)
    for g, w, s in zip(got, want, seqs):
        assert np.array_equal(
            np.nan_to_num(g, posinf=-1), np.nan_to_num(w, posinf=-1)
        ), (offsets, chunk, shards, len(s))
    # and fuzzy vs the oracle (independent truth source)
    assert almost_equal_vec(got[-1], viterbi_scores_oracle(hmm, seqs[-1]))


@pytest.mark.parametrize(
    "offsets,chunk,shards",
    [((1,), 8, 2), ((-1, 1), 8, 4), ((0, 2), 4, 2)],
)
def test_fused_tp_paths_match_oracle(offsets, chunk, shards):
    """Exact paths with the backpointer tensor state-sharded: every
    pointer is window-local on its owner shard; the backtrace pmin walk
    must reproduce the oracle exactly (ties -> lowest global index)."""
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    hmm = banded_hmm(n=256, offsets=offsets, seed=11 + sum(abs(d) for d in offsets))
    sop = _sop(hmm)
    mesh = make_mesh(state=shards)
    tp = FusedTPDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        mesh,
        chunk=chunk,
        interpret=True,
    )
    rng = np.random.default_rng(5)
    seqs = [
        rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
        for t in (2, chunk + 1, 3 * chunk - 1)
    ]
    got = tp.decode_path_batch(seqs)
    for (sc, path), s in zip(got, seqs):
        osc, opath = viterbi_path_oracle(hmm, s)
        assert almost_equal_vec(sc, osc), (offsets, len(s))
        assert np.array_equal(path, opath), (offsets, len(s))


def test_fused_tp_rejects_coupled_operators():
    """Pfam-style operators (dense rows/cols) need per-step exchange."""
    from conftest import CHMM_DIR
    from spec_viterbi_tpu.io import read_hmm

    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    sop = StructuredOperator.from_hmm(hmm)
    assert sop.row_idx or sop.col_idx
    assert not fused_tp_supported(sop, 2, 8)
    mesh = make_mesh(state=2)
    with pytest.raises(ValueError, match="banded"):
        FusedTPDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            mesh,
            chunk=8,
            interpret=True,
        )


def test_fused_tp_halo_budget():
    """Halos must reach only the adjacent shard: chunk·|d| ≤ block."""
    hmm = banded_hmm(n=128, offsets=(2,))
    sop = _sop(hmm)
    # block = 128/4 = 32; chunk 16 × offset 2 = 32-row halo: allowed
    assert fused_tp_supported(sop, 4, 16)
    # chunk 32 × offset 2 = 64 > 32: rejected
    assert not fused_tp_supported(sop, 4, 32)


@pytest.mark.parametrize("offsets,chunk,shards", [((1,), 8, 4), ((-1, 1), 4, 2)])
def test_window_harness_matches_unsharded(offsets, chunk, shards):
    """The mesh-less window harness (the single-real-chip Mosaic
    compile/parity vehicle, VERDICT r3 #4) must reproduce the unsharded
    kernel bit-for-bit — same claim as the shard_map path, provable
    without a mesh."""
    hmm = banded_hmm(n=256, offsets=offsets, seed=3 + sum(abs(d) for d in offsets))
    sop = _sop(hmm)
    em = hmm.emission_matrix(pad_to=sop.n)
    pi = hmm.start_vector(pad_to=sop.n)
    tp = FusedTPDecoder(
        sop, em, pi, mesh=None, shards=shards, chunk=chunk, interpret=True
    )
    fd = FusedStructuredDecoder(sop, em, pi, interpret=True)
    rng = np.random.default_rng(13)
    seqs = [
        rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
        for t in (2, chunk + 1, 3 * chunk - 1)
    ]
    got = tp.decode_batch_emulated(seqs, check_path_kernel=True)
    want = fd.decode_batch(seqs, bucketed=False)
    for g, w, s in zip(got, want, seqs):
        assert np.array_equal(
            np.nan_to_num(g, posinf=-1), np.nan_to_num(w, posinf=-1)
        ), (offsets, chunk, shards, len(s))
    assert almost_equal_vec(got[-1], viterbi_scores_oracle(hmm, seqs[-1]))


def test_window_harness_requires_shards():
    hmm = banded_hmm(n=256, offsets=(1,), seed=1)
    sop = _sop(hmm)
    with pytest.raises(ValueError, match="shards"):
        FusedTPDecoder(
            sop,
            hmm.emission_matrix(pad_to=sop.n),
            hmm.start_vector(pad_to=sop.n),
            mesh=None,
        )
