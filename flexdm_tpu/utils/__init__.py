"""Misc utilities: compilation cache, profiling, logging helpers."""

from .cache import enable_persistent_compilation_cache
from .profiling import StepTimer, trace_context

__all__ = [
    "StepTimer",
    "enable_persistent_compilation_cache",
    "trace_context",
]
