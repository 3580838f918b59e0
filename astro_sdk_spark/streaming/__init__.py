"""Structured Streaming operators (extension — no reference counterpart;
astro-sdk has no streaming abstractions, SURVEY §1.3).

Batch/stream symmetry: every helper here takes a DataFrame that may be
either a static frame or a ``readStream`` frame — the transformations are
identical (Structured Streaming's core design), so the batch oracles in
``astro_sdk_spark.queries`` (q_events_tumbling / q_events_sessions) verify
the same logic the streaming path runs.
"""

from astro_sdk_spark.streaming.ingest import (
    admit_batch,
    clean_batch,
    stream_clean_ingest,
    stream_ingest_neardup,
)
from astro_sdk_spark.streaming.ops import (
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    stateful_anomalies,
    stream_sketch_ingest,
    stateful_user_stats,
    stream_dedup,
    stream_to_table,
    tumbling_window_agg,
)
from astro_sdk_spark.streaming.rollup import ContinuousAggregate, time_bucket

__all__ = [
    "read_events_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "stream_dedup",
    "stream_to_table",
    "stateful_anomalies",
    "stream_sketch_ingest",
    "stateful_user_stats",
    "admit_batch",
    "clean_batch",
    "stream_clean_ingest",
    "stream_ingest_neardup",
    "ContinuousAggregate",
    "time_bucket",
]
