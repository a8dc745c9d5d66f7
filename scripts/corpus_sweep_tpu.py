"""Hardware sweep: fused kernel scores + exact paths vs the independent
XLA structured path and the NumPy oracle, all 24 production models.

Round-2 revalidation of the kernel changes (negative-offset roll,
device-side lane padding, multi-block unroll) on the real chip.
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


def main():
    rng = np.random.default_rng(1234)
    models = sorted(glob.glob("/root/reference/chmm_files/*.chmm"))
    bad = 0
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
        print(f"{os.path.basename(path)}: OK ({hmm.states_num} states)", flush=True)
    print(f"corpus sweep done, {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
