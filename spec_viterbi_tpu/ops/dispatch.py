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


def batch_step(V: jax.Array, a: jax.Array, use_pallas: bool) -> jax.Array:
    """Batched step: U[b,i] = min_j V[b,j] + a[j,i] (a is untransposed)."""
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_matmul(V, a)
    return tropical.tropical_mm_blocked(V, a)


def matmul(A: jax.Array, B: jax.Array, use_pallas: bool) -> jax.Array:
    """Full tropical matmul, used by the specialization (add_level) path."""
    if use_pallas:
        from spec_viterbi_tpu.ops import pallas_kernels

        return pallas_kernels.tropical_matmul(A, B)
    return tropical.tropical_mm_blocked(A, B)
