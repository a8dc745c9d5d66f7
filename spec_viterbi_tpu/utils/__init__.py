"""Utilities: operator-cache persistence, profiling/tracing helpers."""

from spec_viterbi_tpu.utils.cache import OperatorCache
from spec_viterbi_tpu.utils.profiling import trace, StepTimer

__all__ = ["OperatorCache", "trace", "StepTimer"]
