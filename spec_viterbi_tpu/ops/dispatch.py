"""Backend dispatch between jnp reference ops and Pallas TPU kernels.

Policy: Pallas kernels run on TPU backends with lane-aligned (128-padded)
operands — which all :class:`~spec_viterbi_tpu.models.decoder.DeviceHMM`
arrays are. Everything else (CPU tests, interpret-mode debugging) takes the
jnp path. Both paths compute identical (min,+) algebra and are
cross-validated in ``tests/test_pallas_kernels.py``.
"""

from __future__ import annotations

import os

import jax

from spec_viterbi_tpu.ops import tropical


def default_use_pallas() -> bool:
    if os.environ.get("SVT_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def step_mv(a_t: jax.Array, v: jax.Array, use_pallas: bool) -> jax.Array:
    """One recurrence matvec: min_j a_t[i,j] + v[j]."""
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_mv(a_t, v)
    return tropical.tropical_mv(a_t, v)


def step_mv_argmin(a_t: jax.Array, v: jax.Array, use_pallas: bool):
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_mv_argmin(a_t, v)
    return tropical.tropical_mv_argmin(a_t, v)


def batch_step_t(
    a: jax.Array, v_t: jax.Array, use_pallas: bool
) -> jax.Array:
    """Batched step on a state-major carry: U_T[i,b] = min_j a[j,i] + v_t[j,b].

    ``a`` is the *untransposed* transition matrix: in the TN kernel form
    ``C[i,j] = min_k AT[k,i] + B[k,j]`` it already plays the AT role, so no
    per-step transpose is needed anywhere in the scan.
    """
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_matmul_tn(a, v_t)
    return tropical.tropical_mm_tn_blocked(a, v_t)


def matmul_tn(AT: jax.Array, B: jax.Array, use_pallas: bool) -> jax.Array:
    """TN tropical matmul, used by the specialization (add_level) path."""
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_matmul_tn(AT, B)
    return tropical.tropical_mm_tn_blocked(AT, B)
