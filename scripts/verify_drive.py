"""TPU verify drive (.claude/skills/verify/SKILL.md recipe plus each
round's new surfaces): real-corpus parse, every compute path vs the
oracle, universal streaming (incl. ragged lanes), batched level-L dense
spec, fused TP on a banded model, time-parallel decode, scheduler routes
— all on the real TPU."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import spec_viterbi_tpu as svt  # noqa: E402


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    hmm = svt.read_hmm("/root/reference/chmm_files/500.chmm")
    seqs = svt.read_emit_seq("/root/reference/ess_files/emit_3_3500_20.ess")
    dec = svt.ViterbiDecoder(hmm)
    oracle = svt.viterbi_scores_oracle(hmm, seqs[0])
    assert svt.almost_equal_vec(dec.decode(seqs[0]), oracle)
    assert svt.almost_equal_vec(dec.decode_batch(seqs)[0], oracle)
    spec = svt.SpecializedViterbi(level=2)
    spec.spec_with(hmm)
    assert svt.almost_equal_vec(
        spec.run_spec(seqs[0][:200]), svt.viterbi_scores_oracle(hmm, seqs[0][:200])
    )
    print("base drive OK", flush=True)

    # exact path on TPU
    sc, path = dec.decode_path(seqs[0][:300])
    osc, opath = svt.viterbi_path_oracle(hmm, seqs[0][:300])
    assert svt.almost_equal_vec(sc, osc) and np.array_equal(path, opath)
    print("path OK", flush=True)

    # universal streaming: fused engine fast path + XLA fallback engine
    eng = dec.streaming()
    block = np.stack([s[:128] for s in seqs], axis=1)
    st = eng.stream_begin(block[0])
    st = eng.stream_feed(st, block[1:])
    got = eng.stream_scores(st)
    assert svt.almost_equal_vec(
        got[0, : hmm.states_num], svt.viterbi_scores_oracle(hmm, block[:, 0])
    )
    from spec_viterbi_tpu.models.streaming_xla import XLAStreamDecoder

    pinned = svt.ViterbiDecoder(hmm, mode="structured", use_pallas=False)
    eng2 = pinned.streaming()
    assert isinstance(eng2, XLAStreamDecoder)
    st2 = eng2.stream_begin_path(block[0, :2])
    st2 = eng2.stream_feed_path(st2, block[1:40, :2])
    sc2, p2 = eng2.stream_path_finalize(st2)
    _, op2 = svt.viterbi_path_oracle(hmm, block[:40, 0])
    assert np.array_equal(p2[0], op2)
    print("universal streaming OK", flush=True)

    # batched dense spec level 2 on a small model (device program path)
    small = svt.read_hmm("/root/reference/chmm_files/test_chmms/1_test_chmm.chmm")
    sp = svt.SpecializedViterbi(level=2)
    sp.spec_with(small)
    rng = np.random.default_rng(0)
    ss = [rng.integers(0, small.emit_num, size=t).astype(np.int32) for t in (5, 9, 9)]
    for g, s in zip(sp.run_spec_batch(ss), ss):
        assert svt.almost_equal_vec(g, svt.viterbi_scores_oracle(small, s))
    print("dense spec batch OK", flush=True)

    # fused TP on a banded model: REAL Mosaic kernels + real ICI
    # collectives need >=2 chips (fused_tp requires >=2 shards); on the
    # single tunneled chip this stays covered by the CPU-mesh tests only.
    if len(jax.devices()) >= 2:
        from spec_viterbi_tpu.hmm import HMM, to_modified_prob_np
        from spec_viterbi_tpu.parallel import FusedTPDecoder, make_mesh

        nb_states = 256
        brng = np.random.default_rng(13)
        src = np.arange(nb_states - 1, dtype=np.int64)
        bhmm = HMM(
            states_num=nb_states,
            emit_num=4,
            trans_rows=src,
            trans_cols=src + 1,
            trans_probs=to_modified_prob_np(
                brng.uniform(0.1, 1.0, size=nb_states - 1)
            ),
            emissions=to_modified_prob_np(
                brng.uniform(0.1, 1.0, size=(4, nb_states))
            ),
            start_probabilities_cols=np.arange(4, dtype=np.int64),
            start_probabilities=to_modified_prob_np(np.full(4, 0.25)),
        )
        from spec_viterbi_tpu.ops.structured import StructuredOperator as _SO

        bsop = _SO.from_hmm(bhmm)
        shards = 2 ** int(np.log2(min(len(jax.devices()), 8)))
        ftp = FusedTPDecoder(
            bsop,
            bhmm.emission_matrix(pad_to=bsop.n),
            bhmm.start_vector(pad_to=bsop.n),
            make_mesh(state=shards),
            chunk=8,
        )
        bseqs = [brng.integers(0, 4, size=t).astype(np.int32) for t in (9, 25)]
        for g, s in zip(ftp.decode_batch(bseqs), bseqs):
            assert svt.almost_equal_vec(g, svt.viterbi_scores_oracle(bhmm, s))
        for (fsc, fpath), s in zip(ftp.decode_path_batch(bseqs), bseqs):
            _, fop = svt.viterbi_path_oracle(bhmm, s)
            assert np.array_equal(fpath, fop)
        print(f"fused TP OK on {shards} real chips", flush=True)
    else:
        print("fused TP: single chip — validated on CPU mesh (skip)", flush=True)

    # time-parallel single sequence (the go/no-go script measures perf;
    # here just correctness on hardware)
    from spec_viterbi_tpu.ops.structured import StructuredOperator
    from spec_viterbi_tpu.ops.time_parallel import TimeParallelDecoder

    sop = StructuredOperator.from_hmm(hmm)
    tp = TimeParallelDecoder(
        sop,
        hmm.emission_matrix(pad_to=sop.n),
        hmm.start_vector(pad_to=sop.n),
        k=8,
    )
    seq = seqs[0][:500]
    assert svt.almost_equal_vec(tp.decode(seq), svt.viterbi_scores_oracle(hmm, seq))
    tsc, tpath = tp.decode_path(seq)
    _, topath = svt.viterbi_path_oracle(hmm, seq)
    assert np.array_equal(tpath, topath)
    print("time-parallel OK", flush=True)

    # ragged streaming: per-lane valid counts on the fused engine (r4)
    rlens = [90, 40, 128]
    rb = np.zeros((128, 3), np.int32)
    for i, ln in enumerate(rlens):
        rb[:ln, i] = seqs[i % len(seqs)][:ln]
    st = eng.stream_begin(rb[0])
    pos = 1
    while pos < 128:
        w = min(48, 128 - pos)
        st = eng.stream_feed(
            st, rb[pos : pos + w], valid=np.clip([ln - pos for ln in rlens], 0, w)
        )
        pos += w
    rg = eng.stream_scores(st)
    for i, ln in enumerate(rlens):
        assert svt.almost_equal_vec(
            rg[i, : hmm.states_num], svt.viterbi_scores_oracle(hmm, rb[:ln, i])
        ), f"ragged stream lane {i}"
    print("ragged streaming OK", flush=True)

    # scheduler: plan + execute without route names (r4)
    auto = svt.decode_auto(hmm, [s[:200] for s in seqs[:2]], verbose=True)
    for g, s in zip(auto, seqs):
        assert svt.almost_equal_vec(g, svt.viterbi_scores_oracle(hmm, s[:200]))
    # Single long sequence defaults to the serial fused decode (the round-4
    # go/no-go measured time-parallel at 0.29–0.95× of serial); the
    # time-parallel route stays plannable behind the explicit flag.
    wl = svt.Workload.from_seqs([seqs[0]])
    assert svt.plan_route(hmm, wl).kind == "batch"
    wl_tp = svt.Workload.from_seqs([seqs[0]], prefer_time_parallel=True)
    assert svt.plan_route(hmm, wl_tp).kind == "time_parallel"
    print("scheduler OK", flush=True)

    print("VERIFY DRIVE OK on", jax.default_backend())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
