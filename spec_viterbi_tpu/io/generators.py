"""Random dataset generators.

Parameterized, seeded re-designs of the reference's edit-the-source scripts
(``chmm_files/chmm_gen.py:1-63``, ``ess_files/ess_gen.py:1-21``): same output
distributions, but as callable APIs.
"""

from __future__ import annotations

import numpy as np

from spec_viterbi_tpu.hmm import HMM, MOD_PROB_DTYPE, to_modified_prob_np


def generate_random_hmm(
    states_num: int,
    trans_per_state: int = 3,
    emit_range: int = 20,
    num_non_zero_start_probs: int = 2,
    seed: int = 0,
) -> HMM:
    """Random HMM with normalized probability rows (chmm_gen.py semantics)."""
    rng = np.random.default_rng(seed)

    def prob_row(length: int) -> np.ndarray:
        # chmm_gen.py:20-30 draws integers in [0, 100) then normalizes.
        row = rng.integers(0, 100, size=length).astype(np.float64)
        s = row.sum()
        if s == 0:
            row[:] = 1.0
            s = float(length)
        return row / s

    start_cols = np.arange(num_non_zero_start_probs, dtype=np.int64)
    start_probs = to_modified_prob_np(prob_row(num_non_zero_start_probs))

    emissions_by_state = np.stack(
        [prob_row(emit_range) for _ in range(states_num)]
    )  # [N, E]
    emissions = to_modified_prob_np(emissions_by_state.T)  # [E, N]

    rows, cols, probs = [], [], []
    for src in range(states_num):
        dsts = rng.choice(states_num, size=trans_per_state, replace=False)
        p = prob_row(trans_per_state)
        rows.extend([src] * trans_per_state)
        cols.extend(int(d) for d in dsts)
        probs.extend(p)
    hmm = HMM(
        states_num=states_num,
        emit_num=emit_range,
        trans_rows=np.asarray(rows, dtype=np.int64),
        trans_cols=np.asarray(cols, dtype=np.int64),
        trans_probs=to_modified_prob_np(np.asarray(probs)),
        emissions=np.ascontiguousarray(emissions, dtype=MOD_PROB_DTYPE),
        start_probabilities_cols=start_cols,
        start_probabilities=start_probs,
    )
    hmm.validate()
    return hmm


def generate_random_sequences(
    count: int, length: int, emit_range: int = 20, seed: int = 0
) -> list[np.ndarray]:
    """Uniform random symbol sequences (ess_gen.py semantics)."""
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, emit_range, size=length).astype(np.int32)
        for _ in range(count)
    ]
