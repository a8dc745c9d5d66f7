"""Golden score-vector tests over the 4 tiny fixtures.

The expected vectors are the reference's own (``tests/test_helper.h:17-22``),
reused verbatim; comparison is the reference's fuzzy equality (±1.0 in −log2
space, both-inf equal). Every execution path must pass: NumPy oracle, JAX
non-spec (single and batched), and specialized at levels 1..3
(``LEVELS_TO_TEST = 3``, test_helper.h:23).
"""

import math

import numpy as np
import pytest

from spec_viterbi_tpu import (
    SpecializedViterbi,
    ViterbiDecoder,
    almost_equal_vec,
    read_emit_seq,
    read_hmm,
    to_modified_prob,
    viterbi_scores_oracle,
)

INF = math.inf

# test_helper.h:17-22, verbatim
EXPECTED = [
    np.array([25.6574, 24.4874, INF], dtype=np.float64),
    np.array([to_modified_prob(0.04608), to_modified_prob(0.10752)]),
    np.array([to_modified_prob(0.00882), to_modified_prob(0.02646)]),
    np.array(
        [
            INF,
            to_modified_prob(0.00000282),
            to_modified_prob(0.0000181),
            to_modified_prob(0.00000605),
        ]
    ),
]

LEVELS_TO_TEST = 3


def _load(fixture_paths, i):
    chmm_path, ess_path = fixture_paths[i]
    return read_hmm(chmm_path), read_emit_seq(ess_path)[0]


@pytest.mark.parametrize("i", range(4))
def test_oracle_golden(fixture_paths, i):
    hmm, seq = _load(fixture_paths, i)
    res = viterbi_scores_oracle(hmm, seq)
    assert almost_equal_vec(res, EXPECTED[i]), (res, EXPECTED[i])


@pytest.mark.parametrize("i", range(4))
def test_jax_decoder_golden(fixture_paths, i):
    hmm, seq = _load(fixture_paths, i)
    res = ViterbiDecoder(hmm).decode(seq)
    assert almost_equal_vec(res, EXPECTED[i]), (res, EXPECTED[i])


@pytest.mark.parametrize("i", range(4))
def test_jax_decoder_unpadded_golden(fixture_paths, i):
    hmm, seq = _load(fixture_paths, i)
    res = ViterbiDecoder(hmm, pad=False).decode(seq)
    assert almost_equal_vec(res, EXPECTED[i]), (res, EXPECTED[i])


def test_batched_decoder_golden(fixture_paths):
    """All 4 fixtures share enough alphabet? No — batch per fixture's own
    sequences instead: decode fixture 0's two sequences in one batch."""
    hmm = read_hmm(fixture_paths[0][0])
    seqs = read_emit_seq(fixture_paths[0][1])
    batched = ViterbiDecoder(hmm).decode_batch(seqs)
    assert almost_equal_vec(batched[0], EXPECTED[0])
    single = ViterbiDecoder(hmm).decode(seqs[1])
    assert almost_equal_vec(batched[1], single)


@pytest.mark.parametrize("i", range(4))
@pytest.mark.parametrize("level", range(1, LEVELS_TO_TEST + 1))
def test_spec_golden(fixture_paths, i, level):
    hmm, seq = _load(fixture_paths, i)
    spec = SpecializedViterbi(level=level)
    spec.spec_with(hmm)
    res = spec.run_spec(seq)
    assert almost_equal_vec(res, EXPECTED[i]), (level, res, EXPECTED[i])


def test_spec_respecialization(fixture_paths):
    """spec_with must fully replace previous operators
    (GraphBLAS_spec_impl.cpp:45-48)."""
    spec = SpecializedViterbi(level=2)
    hmm0, seq0 = _load(fixture_paths, 0)
    hmm1, seq1 = _load(fixture_paths, 1)
    spec.spec_with(hmm0)
    assert almost_equal_vec(spec.run_spec(seq0), EXPECTED[0])
    spec.spec_with(hmm1)
    assert almost_equal_vec(spec.run_spec(seq1), EXPECTED[1])


def test_unreachable_state_is_inf(fixture_paths):
    """Fixture 0's third state is unreachable → +inf (test_helper.h:18,
    GraphBLAS_helper.cpp:65-68)."""
    hmm, seq = _load(fixture_paths, 0)
    res = ViterbiDecoder(hmm).decode(seq)
    assert np.isposinf(res[2])
