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


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    steps: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """First-touch funnel analysis: per user, the timestamp at which
    each step was first reached, in order.

    Semantics (stated precisely; they are the standard "first touch"
    greedy rule, not maximal matching): ``t_0`` is the user's first
    ``steps[0]`` event; ``t_k`` is the first ``steps[k]`` event at or
    after ``t_{k-1}``, and — when ``within_seconds`` is set — no
    later than ``t_0 + within_seconds`` (the conversion window is
    measured from funnel ENTRY). ``stage`` counts completed steps.

    Shape: every step is an unordered MIN window over the same user
    partitioning — ONE Exchange total, k Window nodes, no joins, no
    sorts (a per-step join cascade would cost k shuffles)."""
    w = W.partitionBy(user_col)
    out = df
    prev_t = None
    t_cols = []
    for i, step in enumerate(steps):
        cond = F.col(event_col) == step
        if prev_t is not None:
            cond = cond & F.col(ts_col).isNotNull() & (
                F.col(ts_col) >= F.col(prev_t)
            )
            if within_seconds is not None:
                cond = cond & (
                    F.unix_micros(F.col(ts_col))
                    <= F.unix_micros(F.col(t_cols[0]))
                    + int(within_seconds * 1_000_000)
                )
        tc = f"step{i}_ts"
        out = out.withColumn(
            tc, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev_t = tc
        t_cols.append(tc)
    # build the when-chain so the HIGHEST completed step is checked
    # first (the last wrap becomes the outermost condition)
    stage = F.lit(0)
    for i in range(len(steps)):
        stage = F.when(F.col(t_cols[i]).isNotNull(), F.lit(i + 1)).otherwise(
            stage
        )
    return (
        out.groupBy(user_col)
        .agg(
            *[F.min(tc).alias(tc) for tc in t_cols],
            F.min(stage).alias("stage"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their FIRST activity; output one row per (cohort_period,
    period_offset) with the count of distinct cohort users active
    that many periods later (offset 0 = the cohort size itself).

    Periods are integer division of epoch-micros — exact int64
    arithmetic, engine-portable. Shape: one window over the user
    partitioning for the first-activity timestamp, then one
    distinct-count aggregate; two Exchanges total."""
    p_us = int(period_seconds) * 1_000_000
    w = W.partitionBy(user_col)
    eus = F.unix_micros(F.col(ts_col))
    first_eus = F.min(eus).over(w)
    out = (
        df.select(
            F.col(user_col),
            F.expr(
                f"unix_micros({ts_col}) DIV {p_us}"
            ).alias("__active_p"),
            first_eus.alias("__first_eus"),
        )
        .withColumn(
            "cohort_period",
            F.expr(f"__first_eus DIV {p_us}").cast("long"),
        )
        .withColumn(
            "period_offset",
            (F.col("__active_p") - F.col("cohort_period")).cast("long"),
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
    return out
