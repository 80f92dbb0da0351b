"""Shared utilities: structured logging, stage timing, profiling hooks."""
from .logging import get_logger, stage_timer
from .profiling import Profiler, model_complexity, count_params

__all__ = ["get_logger", "stage_timer", "Profiler", "model_complexity", "count_params"]
