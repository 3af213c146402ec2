"""Utilities: timing registry and typed configuration."""

from . import config, timing
from .timing import Timer, list_timings, reset_timings, timed, timing as query_timing

__all__ = ["config", "timing", "timed", "Timer", "list_timings", "reset_timings", "query_timing"]
