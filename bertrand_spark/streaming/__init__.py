"""Structured Streaming lift of the engine's time-series operators."""

from .rollup import (
    read_events_stream,
    running_totals,
    sessionize,
    stream_dedup,
    windowed_rollup,
)

__all__ = [
    "windowed_rollup", "sessionize", "stream_dedup", "running_totals",
    "read_events_stream",
]
