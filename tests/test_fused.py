"""Fused whole-sequence Pallas kernel, run in interpreter mode on CPU.

The compiled kernel is exercised on the real TPU by bench.py and the verify
drive; this suite checks the kernel's algebra (BIG-clamped emissions, inf
thresholding, masking of finished lanes, residual handling) hardware-free.
"""

import os

import numpy as np
import pytest

from conftest import CHMM_DIR, TEST_CHMMS

from spec_viterbi_tpu.hmm import almost_equal_vec
from spec_viterbi_tpu.io import read_hmm
from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle
from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder, fused_eligible
from spec_viterbi_tpu.ops.structured import StructuredOperator


def _fused_for(hmm):
    sop = StructuredOperator.from_hmm(hmm)
    assert fused_eligible(sop)
    return FusedStructuredDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        interpret=True,
    )


def test_fused_matches_oracle_production_model():
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (1, 2, 37, 60)]
    got = fd.decode_batch(seqs)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), len(s)


def test_fused_fixture_with_unreachable_state():
    """Fixture 0 has an unreachable state: +inf must survive the BIG
    round-trip (test_helper.h:18 expects {25.66, 24.49, inf})."""
    hmm = read_hmm(os.path.join(TEST_CHMMS, "0_test_chmm.chmm"))
    fd = _fused_for(hmm)
    seq = np.array([0, 1, 0], dtype=np.int32)
    got = fd.decode_batch([seq])[0]
    want = viterbi_scores_oracle(hmm, seq)
    assert np.isinf(want[2]) and np.isinf(got[2])
    assert almost_equal_vec(got, want)


def test_fused_residual_entries():
    hmm = read_hmm(os.path.join(TEST_CHMMS, "3_test_chmm.chmm"))
    sop = StructuredOperator.from_hmm(hmm)
    assert sop.residual_nnz > 0
    fd = _fused_for(hmm)
    rng = np.random.default_rng(4)
    for t in (2, 5, 9):
        seq = rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
        got = fd.decode_batch([seq])[0]
        assert almost_equal_vec(got, viterbi_scores_oracle(hmm, seq)), t


def test_fused_path_kernel_matches_oracle():
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (2, 31, 60)]
    got = fd.decode_path_batch(seqs)
    for (scores, path), s in zip(got, seqs):
        oscores, opath = viterbi_path_oracle(hmm, s)
        assert almost_equal_vec(scores, oscores), len(s)
        assert np.array_equal(path, opath), len(s)


def test_fused_path_kernel_ragged_and_residual():
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    hmm = read_hmm(os.path.join(TEST_CHMMS, "3_test_chmm.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(7)
    seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (9, 3, 6)]
    got = fd.decode_path_batch(seqs)
    for (scores, path), s in zip(got, seqs):
        oscores, opath = viterbi_path_oracle(hmm, s)
        assert almost_equal_vec(scores, oscores), len(s)
        assert np.array_equal(path, opath), len(s)


def test_fused_ragged_lengths_frozen_lanes():
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (3, 50, 11, 29)]
    got = fd.decode_batch(seqs)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), len(s)
