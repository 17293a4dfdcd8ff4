"""Batch replay of Structured Streaming's watermark late-data rule.

Streaming semantics (and the reference's prune-by-age checkpoint rule,
``aligned/retrieval_job.py:2566-2597``): the engine tracks
``watermark = max(event_time seen so far) - delay``, updated at
micro-batch boundaries, and DROPS any row whose event time is older
than the watermark when it arrives. The live path gets this from
``withWatermark`` + the state store; this module reproduces the exact
same rule on a static frame so it can be oracle-verified and used to
backfill a streaming view's history bit-identically to what the live
stream would have kept.

Scale shape: one map-side-combinable aggregate to ``#batches`` rows, a
Window over that tiny frame (one row per micro-batch — thousands, not
billions), and a broadcast join back. No global sort of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def drop_late_events(
    df: DataFrame,
    ts_col: str,
    delay_seconds: float,
    arrival_col: str,
    batch_size: int = 1000,
) -> DataFrame:
    """Drop rows a watermarked stream would have dropped.

    ``arrival_col`` (a monotonically increasing ingest sequence — a
    Kafka offset, a file index, an autoincrement id) defines arrival
    order; consecutive runs of ``batch_size`` rows model one
    micro-batch. A row is kept iff its event time is >= the watermark
    in force when its batch starts:

        watermark(b) = max(ts over batches < b) - delay

    (the first batch has no watermark — everything is kept), which is
    precisely Structured Streaming's rule: the watermark advances at
    batch completion from that batch's max event time.
    """
    batch = F.floor(F.col(arrival_col) / F.lit(int(batch_size)))
    tagged = df.withColumn("__batch", batch)
    per_batch = tagged.groupBy("__batch").agg(
        F.max(ts_col).alias("__bmax")
    )
    # unpartitioned Window is safe HERE only: it runs over the
    # per-batch rollup (one row per micro-batch — thousands at 100 TB,
    # never per event) and the result broadcasts back to the stream
    w = W.orderBy("__batch").rowsBetween(W.unboundedPreceding, -1)
    wm = per_batch.withColumn(
        "__wm",
        F.timestamp_micros(
            F.unix_micros(F.max("__bmax").over(w))
            - F.lit(int(delay_seconds * 1_000_000))
        ),
    )
    kept = tagged.join(
        F.broadcast(wm.select("__batch", "__wm")), on="__batch"
    ).filter(F.col("__wm").isNull() | (F.col(ts_col) >= F.col("__wm")))
    return kept.drop("__batch", "__wm")
