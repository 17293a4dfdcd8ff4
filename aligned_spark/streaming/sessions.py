"""Session-window aggregation — batch/stream unified.

The reference has NO session windows (SURVEY §2.9: fixed windows
only); this extends the engine with Spark's native
``session_window(ts, gap)``: an event extends its session to
``ts + gap``, overlapping extents merge, a session closes after
``gap`` of silence. On a streaming frame the same call runs
incrementally — the state store merges sessions across micro-batches
and the watermark finalizes them (append mode emits a session only
once no earlier event can still arrive).

Boundary semantics: a new session starts when ``ts - prev_ts >=
gap`` (the previous extent is half-open ``[prev, prev+gap)``). The
row-level :func:`aligned_spark.operators.sessions.sessionize` uses
the strict ``>`` gap rule — identical assignment except exact-tie
gaps, which are measure-zero on real event times.

Scale: one shuffle on the entity keys; per-key state in streaming is
bounded by (open sessions × payload), pruned by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aligned_spark.operators.aggregate import AggSpec


def session_aggregate(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap_seconds: float,
    aggs: list[AggSpec],
    watermark_seconds: float | None = None,
) -> DataFrame:
    """Aggregate per (keys, session window). Works identically on a
    batch or streaming frame; pass ``watermark_seconds`` on streams
    (required by Spark for append-mode session finalization).

    Output: ``keys…, session_start, session_end, <agg columns>``
    where ``session_end`` is the last event's time + gap (Spark's
    half-open session extent).

    CAUTION — ``session_end`` is the CLOSE of the window, NOT the
    last event's timestamp: it sits ``gap_seconds`` after the final
    event. Downstream joins/durations that want "time of last
    activity" must use ``session_end - gap`` (or add a ``max(ts)``
    AggSpec), otherwise every session looks ``gap`` longer than it
    was and as-of joins against the end pick up events from the idle
    gap. The batch mirror (``operators/sessions.py:session_stats``)
    emits ``session_end = max(ts)`` — last-event time — so the two
    surfaces intentionally differ and this docstring is the
    boundary's contract."""
    if getattr(df, "isStreaming", False):
        if watermark_seconds is None:
            raise ValueError(
                "streaming session aggregation needs watermark_seconds"
            )
        df = df.withWatermark(ts, f"{int(watermark_seconds)} seconds")
    win = F.session_window(F.col(ts), f"{int(gap_seconds)} seconds")
    out = df.groupBy(*keys, win.alias("__w")).agg(
        *[a.to_agg_column() for a in aggs]
    )
    return (
        out.withColumn("session_start", F.col("__w.start"))
        .withColumn("session_end", F.col("__w.end"))
        .drop("__w")
    )
