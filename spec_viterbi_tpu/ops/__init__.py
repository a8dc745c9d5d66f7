"""(min,+) tropical-semiring ops: jnp reference implementations and Pallas
TPU kernels, plus the dispatcher that picks between them."""

from spec_viterbi_tpu.ops.tropical import (
    tropical_mv,
    tropical_mm,
    tropical_mv_argmin,
    tropical_mm_blocked,
    tropical_mm_tn_blocked,
)

__all__ = [
    "tropical_mv",
    "tropical_mm",
    "tropical_mv_argmin",
    "tropical_mm_blocked",
    "tropical_mm_tn_blocked",
]
