"""Exactly-once streaming sinks.

``foreachBatch`` gives AT-LEAST-ONCE by itself: after an unclean
shutdown, Structured Streaming replays the last unacknowledged batch
from the checkpoint, so the sink sees the same ``(batch_df,
batch_id)`` twice. The standard fix (the Delta protocol's ``txn``
action; delta.io "idempotent table writes") is to commit a
writer-transaction version ATOMICALLY WITH the data: a replayed batch
either finds its ``batch_id`` already recorded — skip — or its
earlier attempt never produced a visible commit, so re-writing is
safe. :class:`aligned_spark.sources.delta_log.DeltaLog` implements
exactly that, jar-free.

Scale note: the replay guard costs one driver-side log-snapshot read
per micro-batch (checkpoint-bounded metadata, no Spark job); the data
path is unchanged — append parts or a file-pruned MERGE.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from aligned_spark.sources.delta_log import (
    ConcurrentCommitError,
    DeltaLog,
)

_MAX_RETRIES = 10


def idempotent_delta_sink(
    table_path: str,
    keys: list[str] | None = None,
    app_id: str = "stream",
    partition_by: list[str] | None = None,
    merge_on_read: bool = False,
    auto_compact: bool = True,
    compact_thresholds: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callable with exactly-once semantics
    into a :class:`DeltaLog` table.

    - ``keys=None`` — append-only (e.g. windowed-agg complete rows);
    - ``keys=[...]`` — MERGE upsert on the entity keys.

    Each micro-batch commits ``txn(app_id, batch_id)`` in the same
    log entry as its adds; a REPLAYED batch (same ``batch_id`` after
    checkpoint recovery) is detected and skipped. ``app_id`` must be
    unique per logical stream writing to the table — two streams
    sharing an app_id would skip each other's batches.
    ``merge_on_read=True`` upserts via position deletes — the
    steady-small-batch posture: per micro-batch cost tracks the
    batch, never the touched parts.

    ``auto_compact`` (default on) makes compaction ride the ingest
    pipeline: after each committed batch the sink consults the
    metadata-only policy (:meth:`DeltaLog.should_compact` — MOR
    sidecar state OR trickle small-file accumulation) and runs at
    most one bounded compaction. Compaction commits are
    ``dataChange=False``, so downstream streams and change feeds
    never see them, and the replay guard is untouched (the txn rides
    the DATA commit)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        log = DeltaLog(table_path)
        for attempt in range(_MAX_RETRIES):
            last = log.txn_version(app_id)
            if last is not None and batch_id <= last:
                return  # replay of an already-committed batch
            try:
                if keys and merge_on_read:
                    log.merge_upsert_mor(
                        batch_df,
                        keys,
                        partition_by,
                        txn=(app_id, batch_id),
                    )
                elif keys:
                    log.merge_upsert(
                        batch_df,
                        keys,
                        partition_by,
                        txn=(app_id, batch_id),
                    )
                else:
                    log.write(
                        batch_df,
                        "append",
                        partition_by,
                        txn=(app_id, batch_id),
                    )
                break
            except ConcurrentCommitError:
                if attempt == _MAX_RETRIES - 1:
                    raise
                # another writer landed a version; re-read (it may
                # even have been our own replayed twin) and retry
        if auto_compact:
            _maybe_compact(log, batch_df, compact_thresholds)

    return sink


def _maybe_compact(
    log, batch_df: DataFrame, thresholds: dict | None = None
) -> None:
    """Post-commit compaction hook shared by the sinks: policy check
    is a driver-side metadata read per micro-batch; a lost race with
    a concurrent writer just defers to the next batch."""
    try:
        log.maybe_optimize(batch_df.sparkSession, **(thresholds or {}))
    except ConcurrentCommitError:
        pass  # someone else is writing; the next batch re-checks


def idempotent_iceberg_sink(
    table_path: str,
    keys: list[str] | None = None,
    app_id: str = "stream",
    partition_by: list[str] | None = None,
    auto_compact: bool = True,
    compact_thresholds: dict | None = None,
) -> Callable[[DataFrame, int], None]:
    """Iceberg twin of :func:`idempotent_delta_sink`: the replay
    guard rides in the snapshot summary (``app-id``/``batch-id``,
    the Flink-on-Iceberg ``max-committed-checkpoint-id`` pattern),
    committed atomically with the data in one metadata version —
    :meth:`IcebergLog.txn_version` reads it back driver-side.
    ``auto_compact`` mirrors the delta sink (``replace`` snapshots,
    invisible to change feeds)."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        log = IcebergLog(table_path)
        for attempt in range(_MAX_RETRIES):
            last = log.txn_version(app_id)
            if last is not None and batch_id <= last:
                return  # replay of an already-committed batch
            try:
                if keys:
                    log.merge_upsert(
                        batch_df, keys, txn=(app_id, batch_id)
                    )
                else:
                    log.write(
                        batch_df,
                        "append",
                        partition_by,
                        txn=(app_id, batch_id),
                    )
                break
            except ConcurrentCommitError:
                if attempt == _MAX_RETRIES - 1:
                    raise
        if auto_compact:
            _maybe_compact(log, batch_df, compact_thresholds)

    return sink
