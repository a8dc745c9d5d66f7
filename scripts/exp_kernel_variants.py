"""TPU experiment: cost breakdown of the fused kernel at b=512.

Times ablated kernel variants (results are WRONG on purpose — only the
timing matters) to find where the 2.77 µs/step·block goes:
 - no_cols:    skip the two dense-col reduces
 - no_mxu:     skip the per-substep MXU emission select (reuse a constant)
 - no_spec:    skip the single-row special updates
 - slice_roll: replace pltpu.roll with static slice+concat
 - unroll3:    3 substeps per grid step
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import spec_viterbi_tpu as svt
from spec_viterbi_tpu.ops import fused_pallas as fp
from spec_viterbi_tpu.ops.structured import StructuredOperator

B = 512
T = 3500
K = 8


def make_variant_kernel(sop, unroll, *, no_cols=False, no_mxu=False,
                        no_spec=False, slice_roll=False):
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = () if no_cols else sop.col_idx
    n = sop.n
    residual = []

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]

        rows = em_ref.shape[1]  # [Np, 2·e_pad] bf16 [hi | lo] split
        e_pad = rows // 2
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, fp.BB), 0)
        sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)
        em_fixed = em_ref[:, :1].astype(jnp.float32) if no_mxu else None

        for u in range(unroll):
            if no_mxu:
                em_sel = em_fixed
            else:
                oh_u = (sym_iota == seq_ref[u]).astype(jnp.bfloat16)
                em_sel = jnp.dot(
                    em_ref[:], oh_u, preferred_element_type=jnp.float32
                )
            v = o_ref[:]
            bulk = []
            for k, d in enumerate(diag_offsets):
                if slice_roll and 0 < d < n:
                    shifted = jnp.concatenate([v[n - d:, :], v[: n - d, :]], axis=0)
                else:
                    shifted = pltpu.roll(v, d % n, axis=0)
                bulk.append(dv_ref[:, k : k + 1] + shifted)
            bulk += [rv_ref[:, k : k + 1] + v[s : s + 1, :] for k, s in enumerate(row_idx)]
            acc = bulk[0]
            for cand in bulk[1:]:
                acc = jnp.minimum(acc, cand)
            o_ref[:] = em_sel + acc

            if not no_spec:
                specials = {}
                for k, c in enumerate(col_idx):
                    cu = jnp.min(cv_ref[:, k : k + 1] + v, axis=0, keepdims=True)
                    specials.setdefault(c, []).append(cu)
                for row, cands in specials.items():
                    extra = cands[0]
                    for cand in cands[1:]:
                        extra = jnp.minimum(extra, cand)
                    o_ref[row : row + 1, :] = em_sel[row : row + 1, :] + jnp.minimum(
                        acc[row : row + 1, :], extra
                    )

    return kernel


def time_variant(fd, name, **flags):
    unroll = flags.pop("unroll", 2)
    orig = fp._make_unrolled_kernel
    fp._make_unrolled_kernel = lambda sop, masked, u, t0, *a, **kw: (
        make_variant_kernel(sop, u, **flags)
    )
    fd._col_plan = None  # variants keep the generic per-col/row forms
    fd._row_plan = None
    fd.unroll = unroll
    fd._jit_run = jax.jit(fd._run, static_argnames=("masked", "b_real"))
    try:
        rng = np.random.default_rng(0)
        # distinct batches per rep — the runtime memoizes identical repeats
        reps = [
            [
                jax.device_put(
                    rng.integers(0, fd.emit_num, size=(T, B)).astype(np.int32)
                )
                for _ in range(K)
            ]
            for _ in range(3)
        ]
        lengths = jax.device_put(np.full((1, B), T, np.int32))
        np.asarray(fd._jit_run(reps[0][0], lengths, masked=False)[:1, :1])
        times = []
        for batches in reps:
            t0 = time.perf_counter()
            outs = [fd._jit_run(bt, lengths, masked=False) for bt in batches]
            np.asarray(outs[-1][:1, :1])
            times.append(time.perf_counter() - t0)
        sec = sorted(times)[1]
        us = sec / (K * (T - 1)) * 1e6
        print(f"{name:12s}: {K*B*T/sec/1e6:7.2f} M sym/s  {us:6.2f} us/step", flush=True)
    except Exception as exc:
        print(f"{name:12s}: FAILED {str(exc)[:120]}", flush=True)
    finally:
        fp._make_unrolled_kernel = orig


def main():
    hmm = svt.read_hmm("/root/reference/chmm_files/2405.chmm")
    sop = StructuredOperator.from_hmm(hmm)
    fd = fp.FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    import ast
    variants = ast.literal_eval(os.environ.get("EXP_VARIANTS", """[
        ("baseline", {}),
        ("no_cols", {"no_cols": True}),
        ("no_mxu", {"no_mxu": True}),
        ("no_spec", {"no_spec": True}),
        ("slice_roll", {"slice_roll": True}),
        ("unroll3", {"unroll": 3}),
    ]"""))
    for name, flags in variants:
        time_variant(fd, name, **flags)


def make_shortchain_kernel(sop, unroll):
    """em_sel folded into dv/rv OFF the dependent chain:
    v' = min((dv+em) + roll(v), (rv+em) + v[s]) - 3 chain ops vs 4."""
    diag_offsets = sop.diag_offsets
    row_idx = sop.row_idx
    col_idx = sop.col_idx
    n = sop.n

    def kernel(v0_ref, dv_ref, rv_ref, cv_ref, resv_ref, em_ref, seq_ref, len_ref, o_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            o_ref[:] = v0_ref[:]

        rows = em_ref.shape[1]  # [Np, 2·e_pad] bf16 [hi | lo] split
        e_pad = rows // 2
        sym_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, fp.BB), 0)
        sym_iota = jnp.where(sym_iota >= e_pad, sym_iota - e_pad, sym_iota)

        for u in range(unroll):
            oh_u = (sym_iota == seq_ref[u]).astype(jnp.bfloat16)
            em_sel = jnp.dot(
                em_ref[:], oh_u, preferred_element_type=jnp.float32
            )
            # off-chain operator+emission folds
            A = [em_sel + dv_ref[:, k : k + 1] for k in range(len(diag_offsets))]
            C = [em_sel + rv_ref[:, k : k + 1] for k in range(len(row_idx))]
            v = o_ref[:]
            cands = [a + pltpu.roll(v, d % n, axis=0) for a, d in zip(A, diag_offsets)]
            cands += [c + v[s : s + 1, :] for c, s in zip(C, row_idx)]
            vn = cands[0]
            for cand in cands[1:]:
                vn = jnp.minimum(vn, cand)
            o_ref[:] = vn
            specials = {}
            for k, c in enumerate(col_idx):
                cu = jnp.min(cv_ref[:, k : k + 1] + v, axis=0, keepdims=True)
                specials.setdefault(c, []).append(cu)
            for row, cu_list in specials.items():
                extra = cu_list[0]
                for cand in cu_list[1:]:
                    extra = jnp.minimum(extra, cand)
                o_ref[row : row + 1, :] = jnp.minimum(
                    vn[row : row + 1, :], em_sel[row : row + 1, :] + extra
                )

    return kernel


def run_shortchain():
    hmm = svt.read_hmm("/root/reference/chmm_files/2405.chmm")
    sop = StructuredOperator.from_hmm(hmm)
    fd = fp.FusedStructuredDecoder(
        sop, hmm.emission_matrix(pad_to=sop.n), hmm.start_vector(pad_to=sop.n)
    )
    orig = fp._make_unrolled_kernel
    fp._make_unrolled_kernel = lambda sop, masked, u, t0, *a, **kw: make_shortchain_kernel(sop, u)
    fd._col_plan = None
    fd._row_plan = None
    fd._jit_run = jax.jit(fd._run, static_argnames=("masked", "b_real"))
    rng = np.random.default_rng(0)
    reps = [
        [jax.device_put(rng.integers(0, fd.emit_num, size=(T, B)).astype(np.int32)) for _ in range(K)]
        for _ in range(3)
    ]
    lengths = jax.device_put(np.full((1, B), T, np.int32))
    np.asarray(fd._jit_run(reps[0][0], lengths, masked=False)[:1, :1])
    times = []
    for batches in reps:
        t0 = time.perf_counter()
        outs = [fd._jit_run(bt, lengths, masked=False) for bt in batches]
        np.asarray(outs[-1][:1, :1])
        times.append(time.perf_counter() - t0)
    sec = sorted(times)[1]
    print(f"shortchain  : {K*B*T/sec/1e6:7.2f} M sym/s  {sec/(K*(T-1))*1e6:6.2f} us/step", flush=True)
    fp._make_unrolled_kernel = orig


if __name__ == "__main__":
    if os.environ.get("EXP_SHORTCHAIN"):
        run_shortchain()
    else:
        main()
