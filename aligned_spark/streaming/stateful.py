"""Custom stateful streaming operators via ``applyInPandasWithState``.

These cover semantics Structured Streaming's built-ins cannot express
(``session_window`` and ``dropDuplicatesWithinWatermark`` handle the
expressible cases — use those first):

- :func:`stateful_dedup`: emit only the FIRST occurrence of each key,
  with a processing-time state TTL. Unlike
  ``dropDuplicatesWithinWatermark`` the TTL is wall-clock, so it works
  on streams with no event-time column at all (training-data ingest
  topics are often append logs without timestamps).
- :func:`decayed_count`: per-key exponentially-decayed event counter
  (half-life semantics). Not expressible as a windowed aggregation —
  the decay is continuous, not a window boundary.
- :func:`event_gaps`: per-key time-since-previous-event in micros —
  the streaming twin of the batch ``lag_features`` operator (exact
  batch parity pinned by test); one int64 of state per key.

State scale: both keep O(1) state per key (a timestamp + a float);
state is hash-partitioned across executors by group key, exactly like
the reference's per-entity aggregation state
(``aligned/retrieval_job.py:2541-2650`` keeps whole raw-row windows —
strictly more state than either operator here).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def stateful_dedup(
    df: DataFrame,
    key_cols: list[str],
    ttl_seconds: int = 3600,
) -> DataFrame:
    """Keep the first row per key; suppress repeats until the key's
    state expires (``ttl_seconds`` of processing time).

    Output schema == input schema. The kept row is the first seen in
    arrival order within each micro-batch."""
    schema = df.schema
    for k in key_cols:
        if k not in schema.names:
            raise ValueError(f"key column {k!r} not in stream schema")
    state_schema = StructType([StructField("seen", LongType())])

    def _fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[:1]
        if not state.exists:
            state.update((1,))
            state.setTimeoutDuration(ttl_seconds * 1000)
            if first is not None:
                yield first
        # key already seen: emit nothing, refresh nothing (TTL runs
        # from first sight — a steady repeat stream still expires)

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            _fn,
            outputStructType=schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def event_gaps(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tie_cols: list[str] | None = None,
    gap_col: str = "gap_us",
    state_ttl_seconds: float | None = None,
) -> DataFrame:
    """Streaming twin of the batch
    :func:`aligned_spark.operators.core.lag_features` gap: per key,
    microseconds since the key's previous event; NULL for a key's
    first event ever. State per key: ONE int64 (the last event
    timestamp) — the continuous-lag semantics a windowed aggregation
    cannot express.

    Events are ordered by ``(ts, *tie_cols)`` WITHIN each micro-batch;
    across batches the state carries the last timestamp forward, so a
    source that delivers batches in event-time order reproduces the
    batch operator exactly (pinned by the parity test). Late
    stragglers get a gap relative to the latest-seen event, and the
    state never rewinds (``max`` merge). ``state_ttl_seconds`` bounds
    state for high-cardinality key streams (a key idle that long
    restarts with a NULL gap)."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField(gap_col, LongType())]
    )
    state_schema = StructType([StructField("last_us", LongType())])
    order = [ts_col] + list(tie_cols or [])

    def _fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(
            drop=True
        )
        us = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000
        prev = us.shift(1)
        if state.exists:
            (last_us,) = state.get
            prev.iloc[0] = last_us
        gaps = (us - prev).astype("Int64")
        new_last = int(us.iloc[-1])
        if state.exists:
            new_last = max(new_last, int(state.get[0]))
        state.update((new_last,))
        if state_ttl_seconds is not None:
            state.setTimeoutDuration(int(state_ttl_seconds * 1000))
        yield pdf.assign(**{gap_col: gaps})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(*key_cols).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def decayed_count(
    df: DataFrame,
    key_cols: list[str],
    half_life_seconds: float = 300.0,
    ts_col: str | None = None,
    state_ttl_seconds: float | None = 3600.0,
) -> DataFrame:
    """Exponentially-decayed per-key event count.

    Every micro-batch emits one row per active key:
    ``count = count_prev · 2^(-Δt / half_life) + n_batch``, with Δt
    from the event timestamps when ``ts_col`` is given, else batch
    processing time. State per key: (last_ts_micros, count) — two
    scalars, regardless of stream volume.

    ``state_ttl_seconds`` bounds state on high-cardinality key
    streams: a key idle that long is re-examined on a processing-time
    timeout and dropped once its decayed count is negligible (< 1e-6),
    matching :func:`stateful_dedup`'s bounded-state design. ``None``
    keeps state forever (the pre-TTL behavior)."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name in key_cols]
        + [StructField("decayed_count", DoubleType())]
    )
    state_schema = StructType(
        [
            StructField("last_us", LongType()),
            StructField("count", DoubleType()),
        ]
    )

    def _fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import time as _time

        if state.hasTimedOut:
            # Idle key: decay by wall-clock since last event; drop the
            # state once negligible, else keep it and re-arm the TTL.
            last_us, count = state.get
            now_us = int(_time.time() * 1_000_000)
            dt = max(now_us - last_us, 0) / 1e6
            count = count * 2.0 ** (-dt / half_life_seconds)
            if count < 1e-6:
                state.remove()
            else:
                # Store the decay reference time, not the old last_us —
                # otherwise the same idle interval is decayed again at the
                # next timeout/event (compounding under-count).
                state.update((now_us, count))
                state.setTimeoutDuration(int(state_ttl_seconds * 1000))
            return
        n = 0
        now_us = None
        for pdf in pdfs:
            n += len(pdf)
            if ts_col is not None and len(pdf):
                batch_max = pd.to_datetime(pdf[ts_col]).max()
                us = int(batch_max.value // 1_000)
                now_us = us if now_us is None else max(now_us, us)
        if now_us is None:
            now_us = int(_time.time() * 1_000_000)
        if state.exists:
            last_us, count = state.get
            dt = max(now_us - last_us, 0) / 1e6
            count = count * 2.0 ** (-dt / half_life_seconds)
        else:
            count = 0.0
        count += float(n)
        state.update((now_us, count))
        if state_ttl_seconds is not None:
            state.setTimeoutDuration(int(state_ttl_seconds * 1000))
        yield pd.DataFrame([[*key, count]], columns=out_schema.names)

    timeout = (
        GroupStateTimeout.NoTimeout
        if state_ttl_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_counters: int = 64,
) -> DataFrame:
    """Per-key streaming heavy hitters with BOUNDED state: a
    Misra-Gries summary of ``num_counters`` counters per group key,
    merged across micro-batches with the mergeable-summaries rule
    (combine counts, subtract the (m+1)-th largest, keep positives).

    Guarantees (classic MG): every value with true frequency
    > N/(m+1) is retained, and each emitted ``count_lo`` is a LOWER
    bound within N/(m+1) of the true count (N = total observations
    for the key so far, tracked exactly in ``total_n``). The
    training-data ingest use: hot-URL / hot-ngram / hot-license
    detection over unbounded-cardinality streams where an exact
    per-value count would hold the whole key space in state.

    Each micro-batch emits the key's full current summary (update
    semantics): ``key…, value, count_lo, total_n``. State per key is
    O(num_counters) regardless of distinct values seen — compare the
    exact alternative (state = every distinct value). No reference
    counterpart (its stream workers aggregate per entity only,
    ``aligned/worker.py:172-204``); the sketch rule follows the
    published mergeable-summaries formulation of Misra-Gries.
    """
    from pyspark.sql.types import ArrayType, StringType

    schema = df.schema
    for k in (*key_cols, value_col):
        if k not in schema.names:
            raise ValueError(f"column {k!r} not in stream schema")
    out_schema = StructType(
        [f for f in schema.fields if f.name in key_cols]
        + [
            StructField("value", StringType()),
            StructField("count_lo", LongType()),
            StructField("total_n", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("values", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("total_n", LongType()),
        ]
    )
    m = int(num_counters)
    if m < 1:
        raise ValueError("num_counters must be >= 1")

    def _fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            values, counts, total = state.get
            sketch = dict(zip(list(values), list(counts)))
        else:
            sketch, total = {}, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            vc = pdf[value_col].astype(str).value_counts()
            total += int(vc.sum())
            for v, c in vc.items():
                sketch[v] = sketch.get(v, 0) + int(c)
        if len(sketch) > m:
            # mergeable-summaries prune: subtract the (m+1)-th largest
            # count from everything, drop non-positives
            cut = sorted(sketch.values(), reverse=True)[m]
            sketch = {v: c - cut for v, c in sketch.items() if c > cut}
        state.update((list(sketch), [sketch[v] for v in sketch], total))
        if sketch:
            rows = pd.DataFrame(
                [[*key, v, c, total] for v, c in sketch.items()],
                columns=out_schema.names,
            )
            yield rows

    return (
        df.groupBy(*key_cols)
        .applyInPandasWithState(
            _fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
