"""Structured Streaming port of the reference's stream worker
(SURVEY.md §2.9; ``StreamWorker.start`` ``aligned/worker.py:150-242``,
``StreamAggregationJob`` ``aligned/retrieval_job.py:2541-2650``).

The reference polls a topic, keeps parquet checkpoints of raw rows per
aggregation window, prunes rows older than ``now − window``, and
re-aggregates the full window each batch. Structured Streaming is the
1:1-and-stronger mapping:

- poll loop            → ``spark.readStream`` micro-batches
- parquet checkpoints  → the state store (incremental, fault-tolerant)
- prune-by-age         → ``withWatermark`` (watermark = window length
                         reproduces the reference's late-data window)
- re-aggregate         → ``groupBy(entities, window(ts, w))`` with
                         partial aggregation
- ``view.batch_write`` → ``foreachBatch`` upsert into the view's sink

At scale: state is partitioned by (entities, window) across executors;
watermarks bound state size; ``foreachBatch`` gives exactly-once
upserts into Delta-style sinks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.contracts import CompiledFeatureView
from aligned_spark.operators import core as ops
from aligned_spark.requests import RetrievalRequest


def stream_source_df(
    spark: SparkSession, view: CompiledFeatureView
) -> DataFrame:
    """``readStream`` for the view's declared stream source."""
    src = view.stream_source
    if src is None:
        raise ValueError(f"view {view.name!r} declares no stream source")
    return src.read_stream(spark)


def stream_job(
    stream_df: DataFrame, view: CompiledFeatureView
) -> DataFrame:
    """The per-batch pipeline of the reference's ``stream_job``
    (``worker.py:172-204``): rename → validate entities → fill missing
    → ensure types → derived features. All expression-level — runs
    identically on a streaming or batch DataFrame."""
    request = RetrievalRequest.from_view(view)
    df = stream_df
    mapping = getattr(view.stream_source, "mapping_keys", None)
    if mapping:
        df = ops.rename(df, mapping)
    df = ops.validate_entities(df, view.entities)
    df = ops.fill_missing_columns(df, view.defaults)
    df = ops.ensure_types(df, request.schema())
    derived = request.needed_derived()
    if derived:
        df = ops.derive(df, derived)
    return df


def stream_aggregate(
    df: DataFrame,
    view: CompiledFeatureView,
    allowed_lateness_seconds: float | None = None,
) -> DataFrame:
    """Windowed streaming aggregation (``StreamAggregationJob`` port).

    Watermark defaults to the longest declared window — exactly the
    reference's prune-by-age semantics (rows older than ``now − w``
    stop contributing). Output is stamped at the window end like the
    hopping-aggregate batch path."""
    if view.event_timestamp is None:
        raise ValueError("stream aggregation needs an event timestamp")
    ts = view.event_timestamp.name
    aggs = [a for a in view.aggregations if a.window.window_seconds]
    if not aggs:
        raise ValueError(f"view {view.name!r} has no windowed aggregations")
    max_window = max(a.window.window_seconds for a in aggs)
    lateness = (
        allowed_lateness_seconds
        if allowed_lateness_seconds is not None
        else max_window
    )
    df = df.withWatermark(ts, f"{int(lateness)} seconds")

    # group aggregations by window geometry; each geometry is one
    # streaming state operator
    outs: list[DataFrame] = []
    by_window: dict[tuple[float, float], list] = {}
    for a in aggs:
        key = (
            a.window.window_seconds,
            a.window.every_seconds or a.window.window_seconds,
        )
        by_window.setdefault(key, []).append(a)
    for (period, every), group in by_window.items():
        win = F.window(F.col(ts), f"{int(period)} seconds", f"{int(every)} seconds")
        agged = df.groupBy(*view.entities, win.alias("__w")).agg(
            *[a.spec.to_agg_column() for a in group]
        )
        outs.append(
            agged.withColumn(ts, F.col("__w.end")).drop("__w")
        )
    if len(outs) == 1:
        return outs[0]
    if any(getattr(o, "isStreaming", False) for o in outs):
        # Structured Streaming rejects joins between aggregated
        # streams — mirror view_query.py's rolling+hopping guard
        # instead of failing at query start.
        raise ValueError(
            "streaming views support a single window geometry; "
            f"view declares {len(outs)} distinct (window, slide) "
            "geometries — split into one streaming view per geometry "
            "or materialize via the batch path"
        )
    out = outs[0]
    for other in outs[1:]:
        out = out.join(other, on=view.entities + [ts], how="outer")
    return out


@dataclass
class StreamWorker:
    """Drives one view's stream into its sink
    (``StreamWorker.start``, ``worker.py:150-169``).

    ``dedup_keys`` inserts a stateful first-occurrence filter
    (:func:`aligned_spark.streaming.stateful.stateful_dedup`) between
    the contract pipeline and the aggregation — the standard guard
    against at-least-once upstream delivery double-counting windowed
    aggregates."""

    store: Any
    view_name: str
    checkpoint_dir: str | None = None
    trigger: dict = field(default_factory=lambda: {"processingTime": "10 seconds"})
    dedup_keys: list[str] | None = None
    dedup_ttl_seconds: int = 3600

    def query(self, sink: Callable[[DataFrame, int], None] | None = None):
        """Build (without awaiting) the streaming query: readStream →
        pipeline → [stateful dedup] → [windowed agg] → foreachBatch
        upsert."""
        view = self.store.views[self.view_name]
        spark = self.store.spark
        raw = stream_source_df(spark, view)
        piped = stream_job(raw, view)
        if self.dedup_keys:
            from aligned_spark.streaming.stateful import stateful_dedup

            piped = stateful_dedup(
                piped, self.dedup_keys, self.dedup_ttl_seconds
            )
        if any(a.window.window_seconds for a in view.aggregations):
            piped = stream_aggregate(piped, view)

        if sink is None:
            target = view.materialized_source or view.source
            keys = view.entities + (
                [view.event_timestamp.name]
                if view.event_timestamp
                else []
            )
            from aligned_spark.sources.delta import (
                HAS_DELTA,
                DeltaSource,
            )

            if isinstance(target, DeltaSource) and not HAS_DELTA:
                # Delta target on the pure-Python log: upgrade the
                # default upsert to the EXACTLY-ONCE sink — the
                # batch_id is committed as a txn action atomically
                # with the data, so a post-crash foreachBatch replay
                # is detected and skipped instead of double-upserted.
                from aligned_spark.streaming.sinks import (
                    idempotent_delta_sink,
                )

                sink = idempotent_delta_sink(
                    target.path,
                    keys=keys,
                    app_id=f"view:{self.view_name}",
                    partition_by=target.partition_by,
                )
            else:

                def sink(batch_df: DataFrame, batch_id: int) -> None:
                    target.upsert(batch_df, keys)

        writer = (
            piped.writeStream.outputMode("update")
            .foreachBatch(sink)
            .trigger(**self.trigger)
        )
        if self.checkpoint_dir:
            writer = writer.option("checkpointLocation", self.checkpoint_dir)
        return writer

    def start(self, sink: Callable[[DataFrame, int], None] | None = None):
        return self.query(sink).start()


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (the reference's feature-view
    joins applied on the streaming side, cf. ``worker.py:172-204``
    batch pipeline parity).

    Semantics worth stating (and pinned by
    ``test_stream_static_enrich_refreshes_dim``): the static side's
    plan re-executes every micro-batch, but for a file-backed dim the
    FILE LISTING is captured in the DataFrame's file index when the
    frame is built — dim files landed later are invisible to a join
    plan that holds the old frame (``refreshByPath`` does not reach
    a plan-captured index). For slowly-changing dims, enrich inside
    ``foreachBatch`` with a freshly-built dim frame
    (``spark.read.parquet(dim_path)`` per batch — one cheap listing
    per micro-batch). The dim is broadcast by default: a
    stream-static join cannot shuffle the unbounded side, and at
    cluster scale the alternative repartitions every micro-batch.
    """
    d = F.broadcast(dim_df) if broadcast_dim else dim_df
    return stream_df.join(d, on=on, how=how)
