"""Event sessionization — gap-based session assignment and per-session
rollups.

The reference has no sessionization operator (its windowed aggs are
fixed/hopping windows, ``aligned/compiler/aggregation_factory.py``);
this extends the events-pipeline surface the same way the dedup
operators extend the corpus surface — it is the standard first step
for behavioral training data (session-level sequence construction).

Spark shape: one window partitioned by the entity keys ordered by
event time — ``lag`` marks gap starts, a running ``sum`` of the marks
numbers the sessions. Both window functions share ONE (partition,
order) spec, so the plan carries a single Exchange + Sort feeding two
adjacent Window nodes (frames differ, so full fusion is impossible —
but the expensive parts, shuffle and sort, happen once). Parallelism = #entities, the natural key
cardinality at 100 TB; there is no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-entity session ordinal (1-based): a new session
    starts when the gap since the previous event exceeds
    ``gap_seconds``. Deterministic given (keys, ts) — ties on ts stay
    in one session."""
    w = W.partitionBy(*keys).orderBy(F.col(ts).asc())
    gap = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w))
    is_new = F.when(
        gap.isNull() | (gap > int(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    keys: list[str],
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session rollup: start/end timestamps, event count, duration
    in seconds (exact integer-microsecond arithmetic)."""
    s = sessionize(df, keys, ts, gap_seconds, session_col)
    return s.groupBy(*keys, session_col).agg(
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts)))
            / F.lit(1_000_000)
        ).alias("duration_s"),
    )
