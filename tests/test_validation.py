"""Observation-symbol validation at decode entry.

A sequence symbol outside ``[0, emit_num)`` used to decode garbage
silently (JAX gathers clamp; the fused kernel's one-hot zeroes out) —
every public decode entry point must raise instead.
"""

import os

import numpy as np
import pytest

from conftest import CHMM_DIR

from spec_viterbi_tpu.hmm import validate_obs_seq
from spec_viterbi_tpu.io import read_hmm
from spec_viterbi_tpu.models.decoder import ViterbiDecoder
from spec_viterbi_tpu.models.spec_structured import StructuredSpecializedViterbi
from spec_viterbi_tpu.models.specializer import SpecializedViterbi


@pytest.fixture(scope="module")
def hmm():
    return read_hmm(os.path.join(CHMM_DIR, "100.chmm"))


def test_validate_obs_seq_passthrough():
    out = validate_obs_seq([0, 1, 2], emit_num=3)
    assert out.dtype == np.int32 and out.tolist() == [0, 1, 2]
    assert validate_obs_seq(np.zeros(0, np.int64), emit_num=3).size == 0


@pytest.mark.parametrize("bad", [[0, 20, 1], [-1, 0], [0, 1000]])
def test_validate_obs_seq_raises(bad):
    with pytest.raises(ValueError, match="out of range"):
        validate_obs_seq(np.asarray(bad), emit_num=20)


def test_validate_obs_seq_rejects_2d():
    with pytest.raises(ValueError, match="1-D"):
        validate_obs_seq(np.zeros((2, 3), np.int32), emit_num=4)


@pytest.mark.parametrize("mode", ["dense", "structured"])
def test_decoder_rejects_bad_symbols(hmm, mode):
    dec = ViterbiDecoder(hmm, mode=mode)
    bad = np.array([0, hmm.emit_num, 1], dtype=np.int32)
    good = np.array([0, 1], dtype=np.int32)
    with pytest.raises(ValueError, match="out of range"):
        dec.decode(bad)
    with pytest.raises(ValueError, match="out of range"):
        dec.decode_batch([good, bad])
    with pytest.raises(ValueError, match="out of range"):
        dec.decode_path(bad)
    with pytest.raises(ValueError, match="out of range"):
        dec.decode_path_batch([bad])


def test_specializers_reject_bad_symbols(hmm):
    bad = np.array([0, hmm.emit_num], dtype=np.int32)
    spec = SpecializedViterbi(level=2)
    spec.spec_with(hmm)
    with pytest.raises(ValueError, match="out of range"):
        spec.run_spec(bad)
    sspec = StructuredSpecializedViterbi(level=1)
    sspec.spec_with(hmm)
    with pytest.raises(ValueError, match="out of range"):
        sspec.run_spec(bad)
    # level-1 dense spec delegates to the decoder; must still raise
    spec1 = SpecializedViterbi(level=1)
    spec1.spec_with(hmm)
    with pytest.raises(ValueError, match="out of range"):
        spec1.run_spec(bad)
