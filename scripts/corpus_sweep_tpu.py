"""Hardware sweep: fused kernel scores + exact paths vs the independent
XLA structured path and the NumPy oracle, all 24 production models.

Round-2 revalidation of the kernel changes (negative-offset roll,
device-side lane padding, multi-block unroll) on the real chip.

Round 5 adds FULL-LENGTH drift validation for the bf16 hi/lo emission
split (fused_pallas module docstring): every model decodes two real
3500-symbol corpus sequences against the exact-emission XLA structured
path, and three anchor models decode 7000-symbol sequences — the worst
accumulated |drift| must stay well inside the ±1.0 contract
(``HMM.h:43-49``); the sweep prints it.
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spec_viterbi_tpu as svt
from spec_viterbi_tpu.models.oracle import viterbi_path_oracle
from spec_viterbi_tpu.ops.fused_pallas import FusedStructuredDecoder, fused_eligible
from spec_viterbi_tpu.ops.structured import StructuredOperator


def _drift(got: np.ndarray, ref: np.ndarray) -> float:
    """Max |Δ| over finite entries; inf-pattern mismatch → +inf."""
    fin = np.isfinite(ref)
    if not np.array_equal(fin, np.isfinite(got)):
        return float("inf")
    return float(np.abs(got[fin] - ref[fin]).max()) if fin.any() else 0.0


def main():
    rng = np.random.default_rng(1234)
    models = sorted(glob.glob("/root/reference/chmm_files/*.chmm"))
    long_seqs = svt.read_emit_seq("/root/reference/ess_files/emit_3_3500_20.ess")[:2]
    seqs_7k = svt.read_emit_seq("/root/reference/ess_files/emit_3_7000_20.ess")[:2]
    anchors = {"500.chmm", "1509.chmm", "2405.chmm"}
    bad = 0
    worst = 0.0
    for path in models:
        hmm = svt.read_hmm(path)
        sop = StructuredOperator.from_hmm(hmm)
        assert fused_eligible(sop), path
        fd = FusedStructuredDecoder(
            sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
        )
        # ragged batch incl. multi-block (160 lanes -> 2 blocks)
        seqs = [
            rng.integers(0, hmm.emit_num, size=rng.integers(2, 120)).astype(np.int32)
            for _ in range(160)
        ]
        xla = svt.ViterbiDecoder(hmm, mode="structured", use_pallas=False)
        got = fd.decode_batch(seqs)
        for g, s in zip(got, seqs[:8]):  # XLA cross-check on a subset
            if not svt.almost_equal_vec(g, xla.decode(s)):
                print(f"SCORE MISMATCH {path} len={len(s)}"); bad += 1
        # paths vs oracle on a subset
        psub = seqs[:4]
        for (sc, p), s in zip(fd.decode_path_batch(psub), psub):
            osc, op = viterbi_path_oracle(hmm, s)
            if not (svt.almost_equal_vec(sc, osc) and np.array_equal(p, op)):
                print(f"PATH MISMATCH {path} len={len(s)}"); bad += 1
        # full-length drift of the split-emission scores kernel vs the
        # exact-emission XLA structured decode (T=3500 every model,
        # T=7000 at the anchors)
        check = list(long_seqs)
        if os.path.basename(path) in anchors:
            check += list(seqs_7k)
        got_long = fd.decode_batch(check)
        dmax = 0.0
        for g, s in zip(got_long, check):
            d = _drift(g, np.asarray(xla.decode(s)))
            dmax = max(dmax, d)
            if not d <= 1.0:  # catches inf (pattern mismatch) too
                print(f"LONG DRIFT {path} len={len(s)}: {d}"); bad += 1
        worst = max(worst, dmax)
        print(
            f"{os.path.basename(path)}: OK ({hmm.states_num} states, "
            f"long-drift {dmax:.4g})",
            flush=True,
        )
    print(f"corpus sweep done, {bad} mismatches, worst long-drift {worst:.4g}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
