from .profiling import StageTimers, trace_to

__all__ = ["StageTimers", "trace_to"]
