"""Structured Streaming lift of the engine's time-series operators."""

from .rollup import (
    foreach_batch_parquet_sink,
    read_events_stream,
    running_totals,
    sessionize,
    stream_dedup,
    stream_ann_enrich,
    stream_curation_pipeline,
    stream_dedup_against_fingerprint_store,
    stream_dedup_against_store,
    stream_fuzzy_dedup,
    stream_stream_join,
    windowed_rollup,
)

__all__ = [
    "windowed_rollup", "sessionize", "stream_dedup", "running_totals",
    "read_events_stream", "stream_stream_join", "foreach_batch_parquet_sink",
    "stream_dedup_against_store", "stream_dedup_against_fingerprint_store",
    "stream_curation_pipeline", "stream_ann_enrich", "stream_fuzzy_dedup",
]
