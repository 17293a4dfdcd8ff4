"""Structured Streaming port of the reference's micro-batch stream
worker (SURVEY.md §2.9): ``readStream`` → contract pipeline →
watermarked windowed aggregation → ``foreachBatch`` upsert."""

from aligned_spark.streaming.sources import (
    FileStreamSource,
    KafkaStreamSource,
    RateStreamSource,
)
from aligned_spark.streaming.joins import stream_interval_join
from aligned_spark.streaming.late import drop_late_events
from aligned_spark.streaming.monitor import psi_monitor
from aligned_spark.streaming.sessions import session_aggregate
from aligned_spark.streaming.sinks import idempotent_delta_sink
from aligned_spark.streaming.stateful import (
    decayed_count,
    event_gaps,
    heavy_hitters,
    stateful_dedup,
)
from aligned_spark.streaming.worker import (
    StreamWorker,
    stream_aggregate,
    stream_job,
    stream_source_df,
)

__all__ = [
    "FileStreamSource",
    "KafkaStreamSource",
    "decayed_count",
    "event_gaps",
    "heavy_hitters",
    "drop_late_events",
    "psi_monitor",
    "session_aggregate",
    "idempotent_delta_sink",
    "stateful_dedup",
    "RateStreamSource",
    "StreamWorker",
    "stream_aggregate",
    "stream_interval_join",
    "stream_job",
    "stream_source_df",
]
