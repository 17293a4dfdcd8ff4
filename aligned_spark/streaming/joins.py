"""Stream-stream joins (Structured Streaming).

The reference's worker is single-stream (poll one topic →
aggregate → write, ``aligned/worker.py:150-242``); joining two live
streams is the capability users graduate to next (click ⋈ impression,
order ⋈ payment). Structured Streaming supports it natively when both
sides are watermarked and the join carries an event-time bound — the
bound is what lets the engine drop state: a buffered left row can be
evicted once the right watermark passes ``left_ts + upper_bound``.

At scale: state is hash-partitioned on the join keys across executors;
per-key state is bounded by (rate × interval width). An unbounded
equi-join of two streams (no time bound) is rejected by Spark itself —
by design, state would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_bound_seconds: float,
    upper_bound_seconds: float,
    watermark_seconds: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equality keys plus an event-time interval:
    match when ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    ``left_ts`` and ``right_ts`` must be distinct column names (rename
    one side first) — both timestamps survive into the output, which
    downstream watermarked operators need. Watermark defaults to the
    interval width: late data beyond the interval could never match
    anyway, so that is the tightest state bound with no correctness
    loss; pass a larger ``watermark_seconds`` to tolerate more
    out-of-orderness.

    Outer variants (``how='left_outer'`` etc.) emit the unmatched row
    only once the watermark proves no match can still arrive — exactly
    the semantics batch users expect, delayed by the lateness bound.
    """
    if left_ts == right_ts:
        raise ValueError(
            "left_ts and right_ts must differ (rename one side)"
        )
    wm = (
        watermark_seconds
        if watermark_seconds is not None
        else abs(upper_bound_seconds - min(lower_bound_seconds, 0.0))
    )
    l = left.withWatermark(left_ts, f"{int(wm)} seconds").alias("l")
    r = right.withWatermark(right_ts, f"{int(wm)} seconds").alias("r")
    conds = [f"l.{k} = r.{k}" for k in on] + [
        f"r.{right_ts} >= l.{left_ts} + INTERVAL {int(lower_bound_seconds)} SECONDS",
        f"r.{right_ts} <= l.{left_ts} + INTERVAL {int(upper_bound_seconds)} SECONDS",
    ]
    joined = l.join(r, F.expr(" AND ".join(conds)), how=how)
    # project join keys once (they are equal by construction; coalesce
    # covers the null side of outer variants); keep every other column
    # from both sides
    keep = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in on
    ]
    keep += [
        F.col(f"l.{c}") for c in left.columns if c not in on
    ]
    keep += [
        F.col(f"r.{c}") for c in right.columns if c not in on
    ]
    return joined.select(*keep)
