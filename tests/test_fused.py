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



def _chain_hmm(rng, states, em_probs):
    """Profile-shaped HMM (chain + dense fan-out row) -> fused-eligible."""
    from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np

    rows = [0] * states + list(range(1, states - 1))
    cols = list(range(states)) + list(range(2, states))
    probs = rng.uniform(0.1, 1.0, size=len(rows))
    return HMM(
        states_num=states,
        emit_num=em_probs.shape[0],
        trans_rows=np.asarray(rows, dtype=np.int64),
        trans_cols=np.asarray(cols, dtype=np.int64),
        trans_probs=to_modified_prob_np(probs),
        emissions=to_modified_prob_np(em_probs),
        start_probabilities_cols=np.array([0, 1], dtype=np.int64),
        start_probabilities=to_modified_prob_np(np.array([0.5, 0.5])),
    )


def test_fused_path_parity_through_dead_symbol():
    """A symbol emitted by no state drives every carry to the semantic
    zero; the BIG-clamped kernel must still emit the oracle's pointers
    (all-inf rows backtrace to state 0)."""
    from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    rng = np.random.default_rng(2)
    states, emit = 40, 4
    em = rng.uniform(0.1, 1.0, size=(emit, states))
    em[3, :] = 0.0  # dead symbol
    hmm = _chain_hmm(rng, states, em)
    fd = _fused_for(hmm)
    seq = np.array([0, 1, 3, 2, 0, 1], dtype=np.int32)  # dies at step 2
    (scores, path), = fd.decode_path_batch([seq])
    oscores, opath = viterbi_path_oracle(hmm, seq)
    assert almost_equal_vec(scores, oscores)
    assert np.array_equal(path, opath), (path, opath)


def test_fused_large_alphabet_e_pad():
    """Alphabets beyond 32 symbols grow the one-hot pad instead of crashing."""
    from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np
    from spec_viterbi_tpu.models.oracle import viterbi_scores_oracle

    rng = np.random.default_rng(6)
    states, emit = 40, 40
    hmm = _chain_hmm(rng, states, rng.uniform(0.1, 1.0, size=(emit, states)))
    fd = _fused_for(hmm)
    assert fd.e_pad == 64
    seq = rng.integers(0, emit, size=17).astype(np.int32)
    got = fd.decode_batch([seq])[0]
    assert almost_equal_vec(got, viterbi_scores_oracle(hmm, seq))


def test_fused_negative_diag_offset():
    """A subdiagonal (i → i−1 chain) must decode through the fused kernel:
    pltpu.roll only accepts non-negative shifts, so negative offsets roll by
    ``d % n`` (wrap rows carry +inf in the diagonal values)."""
    from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np

    rng = np.random.default_rng(11)
    states = 40
    # dense fan-out row 0 + descending chain i -> i-1 (offset -1 diagonal)
    rows = [0] * states + list(range(2, states))
    cols = list(range(states)) + list(range(1, states - 1))
    probs = rng.uniform(0.1, 1.0, size=len(rows))
    hmm = HMM(
        states_num=states,
        emit_num=4,
        trans_rows=np.asarray(rows, dtype=np.int64),
        trans_cols=np.asarray(cols, dtype=np.int64),
        trans_probs=to_modified_prob_np(probs),
        emissions=to_modified_prob_np(rng.uniform(0.1, 1.0, size=(4, states))),
        start_probabilities_cols=np.array([0, states - 1], dtype=np.int64),
        start_probabilities=to_modified_prob_np(np.array([0.5, 0.5])),
    )
    sop = StructuredOperator.from_hmm(hmm)
    assert any(d < 0 for d in sop.diag_offsets), sop.diag_offsets
    fd = _fused_for(hmm)
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    for t in (2, 17, 33):
        seq = rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
        got = fd.decode_batch([seq])[0]
        assert almost_equal_vec(got, viterbi_scores_oracle(hmm, seq)), t
        (scores, path), = fd.decode_path_batch([seq])
        oscores, opath = viterbi_path_oracle(hmm, seq)
        assert almost_equal_vec(scores, oscores), t
        assert np.array_equal(path, opath), t


def test_fused_rejects_out_of_range_symbols():
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    bad = np.array([0, hmm.emit_num, 1], dtype=np.int32)
    with pytest.raises(ValueError, match="out of range"):
        fd.decode_batch([bad])
    with pytest.raises(ValueError, match="out of range"):
        fd.decode_path_batch([np.array([-1, 0], dtype=np.int32)])


def test_fused_uniform_length_one_batch():
    """A uniform batch of length-1 sequences must not run the min_t padding
    step unmasked (regression: masked=False skipped the freeze)."""
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    seqs = [np.array([2], dtype=np.int32), np.array([5], dtype=np.int32)]
    got = fd.decode_batch(seqs)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s))


def test_frame_shifted_kernel_bit_identical_to_base():
    """The frame-shifted unmasked kernel (_make_fs_kernel) must emit the
    EXACT same scores as the base kernel — same candidate multisets, f32
    min is exact — across unroll depths, tails, and multi-block batches."""
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    assert fd._fs_ok
    rng = np.random.default_rng(7)
    # (lanes, length): tails of every residue at unroll 2 and 4, plus a
    # multi-block batch that takes the deeper unroll
    # (t=1 stays masked: the t_min padding step freezes, see prepare)
    # 256 and 512 lanes take the WIDE lane blocks (lb256/lb512 — the
    # stall-filling configuration, _fs_plan_for)
    for b, t in ((2, 2), (3, 6), (5, 23), (130, 9), (1, 24), (256, 10), (512, 7)):
        seqs = [
            rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
            for _ in range(b)
        ]
        st, ln, masked = fd.prepare(seqs)
        assert not masked  # uniform lengths compile the mask out
        got = np.asarray(fd._jit_run(st, ln, masked=False, b_real=b))
        # base kernel, forced via the masked path (mask never fires here)
        base = np.asarray(fd._jit_run(st, ln, masked=True, b_real=b))
        np.testing.assert_array_equal(got, base)
        for g, s in zip(got, seqs):
            assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), (b, t)


@pytest.mark.parametrize("unroll", [4, 8])
def test_frame_shifted_kernel_deep_unroll_chain(unroll):
    """Deep-unroll main body + tail on a multi-block batch: the realign
    roll, the scratch-carried running min, and the main→tail frame
    handoff (unroll=8 is the adaptive FS depth at full occupancy)."""
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        interpret=True,
        unroll=unroll,
    )
    assert fd._fs_ok
    rng = np.random.default_rng(11)
    seqs = [
        rng.integers(0, hmm.emit_num, size=15).astype(np.int32)
        for _ in range(130)
    ]
    st, ln, masked = fd.prepare(seqs)
    assert not masked
    got = np.asarray(fd._jit_run(st, ln, masked=False, b_real=len(seqs)))
    base = np.asarray(fd._jit_run(st, ln, masked=True, b_real=len(seqs)))
    np.testing.assert_array_equal(got, base)
    assert almost_equal_vec(got[17], viterbi_scores_oracle(hmm, seqs[17]))


def test_fused_multi_block_batch_unrolled():
    """Batches over 128 lanes keep the unrolled kernel (round-1 dropped to
    unroll=1 for b != 128; the seq BlockSpec indexes per lane block)."""
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(13)
    # 150 ragged sequences -> 256 lanes (2 blocks), odd lengths hit the tail
    seqs = [
        rng.integers(0, hmm.emit_num, size=rng.integers(2, 23)).astype(np.int32)
        for _ in range(150)
    ]
    got = fd.decode_batch(seqs)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), len(s)


def test_fused_unroll4_width_gate():
    """b >= 256 lanes runs ONE wide lane block at unroll 4 (the
    stall-filling grid, `_plan_for` / exp_base_laneblock.py); 128-lane
    multiples below that keep the measured u2 tier and non-multiples
    drop to (128, 1). Pins the wide-block u4 code path in CI with a
    512-lane oracle check."""
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    assert fd._plan_for(512) == (512, 4)
    assert fd._plan_for(256) == (256, 4)
    assert fd._plan_for(128) == (128, 2)
    assert fd._plan_for(130) == (128, 1)
    rng = np.random.default_rng(17)
    # 500 ragged sequences -> 512 lanes (4 blocks): u4 with a tail step
    seqs = [
        rng.integers(0, hmm.emit_num, size=rng.integers(2, 15)).astype(np.int32)
        for _ in range(500)
    ]
    got = fd.decode_batch(seqs, bucketed=False)
    for g, s in zip(got[::37], seqs[::37]):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), len(s)


def test_path_kernel_wide_lane_block_bit_identical():
    """The path/backtrace kernels route wide lane blocks at b >= 256
    (`_path_lb` — the stall-filling grid). Paths must stay bit-identical
    to the oracle across widths: run 256 lanes (one 256-wide block) and
    assert backpointer paths and scores vs lb=128 AND the oracle."""
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    assert fd._path_lb(256) == 256
    assert fd._path_lb(128) == 128
    assert fd._path_lb(130) == 128
    rng = np.random.default_rng(21)
    seqs = [
        rng.integers(0, hmm.emit_num, size=12).astype(np.int32)
        for _ in range(256)
    ]
    st, ln, masked = fd.prepare(seqs)
    v0 = fd.em_clamped[:, :].take(st[0], axis=1) + fd.pi[:, None]
    obs = st[1:, None, :]
    wide = fd._path_pallas(v0, obs, ln, masked)
    narrow = fd._path_pallas(v0, obs, ln, masked, lane_block=128)
    assert np.array_equal(np.asarray(wide[0]), np.asarray(narrow[0]))
    assert np.array_equal(np.asarray(wide[1]), np.asarray(narrow[1]))
    got = fd.decode_path_batch(seqs)
    for (scores, path), s in zip(got[::61], seqs[::61]):
        oscores, opath = viterbi_path_oracle(hmm, s)
        assert almost_equal_vec(scores, oscores)
        assert np.array_equal(path, opath)


def test_fused_ragged_lengths_frozen_lanes():
    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, hmm.emit_num, size=t).astype(np.int32) for t in (3, 50, 11, 29)]
    got = fd.decode_batch(seqs)
    for g, s in zip(got, seqs):
        assert almost_equal_vec(g, viterbi_scores_oracle(hmm, s)), len(s)


def test_whole_batch_path_budget_refusal():
    """bucketed=False must refuse over-budget shapes BEFORE dispatch (the
    documented ValueError bench_ragged records as NaN), not device-OOM."""
    import os

    import pytest

    from conftest import CHMM_DIR
    from spec_viterbi_tpu.io import read_hmm
    from spec_viterbi_tpu.ops.structured import StructuredOperator

    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    sop = StructuredOperator.from_hmm(hmm)
    fd = FusedStructuredDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        interpret=True,
    )
    seqs = [np.zeros(64, np.int32) for _ in range(4)]
    old = fd.MAX_PATH_BYTES
    try:
        fd.MAX_PATH_BYTES = 1024  # force the budget wall
        with pytest.raises(ValueError, match="budget"):
            fd.decode_path_batch(seqs, bucketed=False)
    finally:
        fd.MAX_PATH_BYTES = old


def test_em_split3_proof_and_exact_reconstruction():
    """_split_em_cat3 must PROVE bit-exact any-order reconstruction for
    corpus-shaped tables (incl. BIG padding entries), and the decoder must
    select it for path flows (module docstring precision note)."""
    from spec_viterbi_tpu.ops.fused_pallas import BIG, BIG_THRESHOLD, _split_em_cat3

    hmm = read_hmm(os.path.join(CHMM_DIR, "100.chmm"))
    fd = _fused_for(hmm)
    assert fd._em3_ok and fd.em_exact3 is not None
    assert fd.em_exact3.shape == (fd.n, 3 * fd.e_pad)

    rng = np.random.default_rng(11)
    table = rng.uniform(0.0, 60.0, size=(256, 32)).astype(np.float32)
    table[:, 20:] = BIG
    table[rng.uniform(size=table.shape) < 0.05] = BIG
    em3, ok = _split_em_cat3(table)
    assert ok
    e = table.shape[1]
    h, m, l = (em3[:, i * e : (i + 1) * e].astype(np.float32) for i in range(3))
    rec = (h + m) + l
    assert np.array_equal(rec, table)
    assert np.all(rec[table >= BIG_THRESHOLD] >= BIG_THRESHOLD)


def test_path_kernel_bf16x3_bit_identical_to_highest():
    """The proved bf16 [hi|mid|lo] path selection must give carries, ties
    and paths BIT-identical to the precision=HIGHEST dot it replaces."""
    from spec_viterbi_tpu.models.oracle import viterbi_path_oracle

    for name, td in (("100.chmm", CHMM_DIR), ("3_test_chmm.chmm", TEST_CHMMS)):
        hmm = read_hmm(os.path.join(td, name))
        fd3 = _fused_for(hmm)
        fd1 = _fused_for(hmm)
        fd1._em3_ok = False  # force the HIGHEST fallback on one instance
        assert fd3._em3_ok
        rng = np.random.default_rng(13)
        seqs = [
            rng.integers(0, hmm.emit_num, size=t).astype(np.int32)
            for t in (5, 33, 64)
        ]
        got3 = fd3.decode_path_batch(seqs)
        got1 = fd1.decode_path_batch(seqs)
        for (s3, p3), (s1, p1), s in zip(got3, got1, seqs):
            assert np.array_equal(s3, s1), (name, len(s))
            assert np.array_equal(p3, p1), (name, len(s))
            oscores, opath = viterbi_path_oracle(hmm, s)
            assert np.array_equal(p3, opath), (name, len(s))
            assert almost_equal_vec(s3, oscores), (name, len(s))
