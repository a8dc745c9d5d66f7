"""Pallas TPU kernels for tropical (min,+) linear algebra.

The (min,+) semiring cannot use the MXU (the systolic array only does
multiply-accumulate), so these kernels live on the VPU and are designed to be
HBM-bandwidth-optimal: 128-aligned blocks, operands streamed through VMEM
once, min-accumulation in VMEM scratch-free form via grid-revisited output
blocks.

Kernel inventory (reference ops they replace — see SURVEY.md §2):

- :func:`tropical_mv` — the decode-step matvec, the hot op of
  ``run_Viterbi`` / ``run_Viterbi_spec`` (``CUSP_impl.cu:16-20``).
- :func:`tropical_mv_argmin` — matvec + argmin backpointers (backtrace
  extension; ties to lowest index).
- :func:`tropical_matmul` — SRGEMM equivalent of cuASR's
  ``Srgemm<minimum, plus>`` (``cuASR_helper.cu:65-73``); used for batched
  decode ([B,N] ⊗ [N,N]) and for specialization operator products
  (``add_level``, ``GraphBLAS_spec_impl.cpp:15-36``).

All shapes must be multiples of (8, 128) f32 tiles; ``DeviceHMM`` pads the
state dimension to 128 lanes and batch dims are padded to 8 sublanes by the
callers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.inf

# Block sizes for the matmul kernel. K is consumed in sub-chunks to bound the
# [BI, K_INNER, BJ] broadcast temp in VMEM (128·8·128·4B = 512 KiB).
BI = 128
BJ = 128
BK = 128
K_INNER = 8


def _mv_kernel(m_ref, v_ref, o_ref):
    # m_ref: [BI, N] row band; v_ref: [1, N] full; o_ref: [1, BI]
    o_ref[0, :] = jnp.min(m_ref[:] + v_ref[0, :][None, :], axis=1)


@jax.jit
def tropical_mv(M: jax.Array, v: jax.Array) -> jax.Array:
    """``min_j M[i,j] + v[j]`` — one decode step. M: [N, N], v: [N]."""
    n, k = M.shape
    assert n % BI == 0, f"rows must be {BI}-aligned, got {n} (pad the states)"
    v2 = v.reshape(1, k)
    out = pl.pallas_call(
        _mv_kernel,
        grid=(n // BI,),
        in_specs=[
            pl.BlockSpec((BI, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BI), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), M.dtype),
    )(M, v2)
    return out.reshape(n)


def _mv_argmin_kernel(m_ref, v_ref, o_ref, idx_ref):
    s = m_ref[:] + v_ref[0, :][None, :]
    o_ref[0, :] = jnp.min(s, axis=1)
    idx_ref[0, :] = jnp.argmin(s, axis=1).astype(jnp.int32)


@jax.jit
def tropical_mv_argmin(M: jax.Array, v: jax.Array):
    """Decode step returning (scores, argmin backpointers)."""
    n, k = M.shape
    assert n % BI == 0, f"rows must be {BI}-aligned, got {n} (pad the states)"
    v2 = v.reshape(1, k)
    out, idx = pl.pallas_call(
        _mv_argmin_kernel,
        grid=(n // BI,),
        in_specs=[
            pl.BlockSpec((BI, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BI), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BI), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), M.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(M, v2)
    return out.reshape(n), idx.reshape(n)


def _mm_tn_kernel(at_ref, b_ref, c_ref, *, k_steps):
    # Grid (i, j, k); k innermost so the output block stays resident while
    # the min accumulates across K. Both operands are sliced along their
    # leading (sublane) dim — Mosaic requires lane-dim offsets to be
    # 128-aligned, which is why A arrives transposed.
    @pl.when(pl.program_id(2) == 0)
    def _init():
        c_ref[:] = jnp.full(c_ref.shape, INF, dtype=c_ref.dtype)

    def body(s, acc):
        at = at_ref[pl.ds(s * K_INNER, K_INNER), :]        # [K_INNER, BI]
        b = b_ref[pl.ds(s * K_INNER, K_INNER), :]          # [K_INNER, BJ]
        return jnp.minimum(acc, jnp.min(at[:, :, None] + b[:, None, :], axis=0))

    c_ref[:] = jax.lax.fori_loop(0, k_steps, body, c_ref[:])


@jax.jit
def tropical_matmul_tn(AT: jax.Array, B: jax.Array) -> jax.Array:
    """``C[i,j] = min_k AT[k,i] + B[k,j]`` — tropical SRGEMM, lhs stored
    transposed (BLAS "TN"). AT: [K, I], B: [K, J]; all dims multiples of 128.

    The TN layout is free for our callers: the batched decoder carries its
    score block state-major ([N, B]) so the carry itself is the B operand,
    and the specializer keeps a transposed copy of the level-1 operator
    stack.
    """
    k_dim, i_dim = AT.shape
    k2, j_dim = B.shape
    assert k_dim == k2, (AT.shape, B.shape)
    assert i_dim % BI == 0 and k_dim % BK == 0 and j_dim % BJ == 0, (
        AT.shape,
        B.shape,
    )
    grid = (i_dim // BI, j_dim // BJ, k_dim // BK)
    return pl.pallas_call(
        functools.partial(_mm_tn_kernel, k_steps=BK // K_INNER),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BK, BI), lambda i, j, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BJ), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BI, BJ), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((i_dim, j_dim), AT.dtype),
    )(AT, B)


@jax.jit
def tropical_matmul(A: jax.Array, B: jax.Array) -> jax.Array:
    """``min_k A[i,k] + B[k,j]``: convenience wrapper that transposes the
    lhs outside the kernel (one XLA transpose; avoid in per-step loops by
    calling :func:`tropical_matmul_tn` with pre-transposed data)."""
    return tropical_matmul_tn(A.T, B)
