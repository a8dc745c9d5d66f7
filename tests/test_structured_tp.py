"""State-sharded structured decode (halo-exchange TP) vs the oracle."""

import numpy as np
import pytest

from spec_viterbi_tpu.hmm import almost_equal_vec
from spec_viterbi_tpu.io import read_hmm
from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle
from spec_viterbi_tpu.ops.structured import StructuredOperator
from spec_viterbi_tpu.parallel import make_mesh
from spec_viterbi_tpu.parallel.structured_tp import (
    decode_batch_structured_tp,
    structured_tp_supported,
)


@pytest.fixture(scope="module")
def model():
    return read_hmm("/root/reference/chmm_files/100.chmm")


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_structured_tp_matches_oracle(model, shards):
    mesh = make_mesh(state=shards)
    sop = StructuredOperator.from_hmm(model)
    assert structured_tp_supported(sop, shards)
    rng = np.random.default_rng(31)
    seqs = [rng.integers(0, model.emit_num, size=t).astype(np.int32) for t in (1, 9, 40)]
    got = decode_batch_structured_tp(model, seqs, mesh)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(model, s)), len(s)


def test_structured_tp_larger_model():
    hmm = read_hmm("/root/reference/chmm_files/500.chmm")
    mesh = make_mesh(state=8)
    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, hmm.emit_num, size=64).astype(np.int32)]
    got = decode_batch_structured_tp(hmm, seqs, mesh)
    assert almost_equal_vec(got[0], viterbi_scores_oracle(hmm, seqs[0]))


@pytest.mark.parametrize("shards", [2, 8])
def test_structured_dp_matches_oracle(model, shards):
    from spec_viterbi_tpu.parallel import decode_batch_structured_dp

    mesh = make_mesh(data=shards)
    rng = np.random.default_rng(41)
    seqs = [rng.integers(0, model.emit_num, size=t).astype(np.int32) for t in (5, 27, 50)]
    got = decode_batch_structured_dp(model, seqs, mesh)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(model, s)), len(s)
