"""Named (min,+) ops used by the decode/specialization paths.

All dense tropical algebra routes to the XLA implementations in
:mod:`spec_viterbi_tpu.ops.tropical`. A dense Pallas SRGEMM existed through
round 1 as a third backend (the cuASR analog, ``cuASR_helper.cu:65-73``)
but was removed after measurement: inside the decode scan XLA pre-layouts
the loop-invariant operator once and runs the [2432²×128] step at
~330 µs ≈ the VPU compute roofline, while the best Pallas TN kernel (and
XLA itself, standalone) pays the lane↔sublane relayout per call (~8 ms).
A backend that cannot beat the roofline the default already hits is not a
backend — see BASELINE.md §"dense backend". Pallas on this machine earns
its keep where fusion wins, not where XLA is already optimal:
:mod:`spec_viterbi_tpu.ops.fused_pallas` (whole-sequence structured
kernel, 300× the dense path).
"""

from __future__ import annotations

import jax

from spec_viterbi_tpu.ops import tropical


def step_mv(a_t: jax.Array, v: jax.Array) -> jax.Array:
    """One recurrence matvec: min_j a_t[i,j] + v[j]."""
    return tropical.tropical_mv(a_t, v)


def step_mv_argmin(a_t: jax.Array, v: jax.Array):
    return tropical.tropical_mv_argmin(a_t, v)


def batch_step_t(a: jax.Array, v_t: jax.Array) -> jax.Array:
    """Batched step on a state-major carry: U_T[i,b] = min_j a[j,i] + v_t[j,b].

    ``a`` is the *untransposed* transition matrix: in the TN form
    ``C[i,j] = min_k AT[k,i] + B[k,j]`` it already plays the AT role, so no
    per-step transpose is needed anywhere in the scan.
    """
    return tropical.tropical_mm_tn_blocked(a, v_t)


def matmul_tn(AT: jax.Array, B: jax.Array) -> jax.Array:
    """TN tropical matmul, used by the specialization (add_level) path."""
    return tropical.tropical_mm_tn_blocked(AT, B)
