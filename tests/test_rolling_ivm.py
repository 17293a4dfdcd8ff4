"""Rolling-window (per-row trailing frame) IVM
(`RollingIncrementalAggregate`): the maintained per-row `[ts - w, ts]`
rolling view equals the batch `rolling_aggregate` over the base after
any op sequence (reference rolling regime: aligned/local/job.py:97-166
— kept fresh there only by full re-aggregation)."""

import datetime as dt
import uuid as _uuid

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 10, 0, minute, 0)


def _mk_rows(spec):
    """spec: list of (k, g, minute, x)."""
    return [
        Row(k=k, g=g, ts=_ts(m), x=float(x)) for k, g, m, x in spec
    ]


_W = 600.0  # 10-minute trailing window


def _aggs():
    from aligned_spark.operators.aggregate import AggSpec

    return [
        AggSpec("s", "sum", "x"),
        AggSpec("n", "count", "x"),
        AggSpec("mn", "min", "x"),
    ]


def _mk_agg(src, target):
    from aligned_spark.operators.incremental import (
        RollingIncrementalAggregate,
    )

    return RollingIncrementalAggregate(
        source=src,
        target_path=target,
        row_keys=["k"],
        group_keys=["g"],
        ts_col="ts",
        window_seconds=_W,
        aggs=_aggs(),
    )


def _direct(spark, src):
    from aligned_spark.operators.aggregate import rolling_aggregate

    return {
        r.k: (r.g, r.ts, r.x, r.s, r.n, r.mn)
        for r in rolling_aggregate(
            src.read(spark), ["g"], "ts", _W, _aggs()
        ).collect()
    }


def _maintained(spark, agg):
    return {
        r.k: (r.g, r.ts, r.x, r.s, r.n, r.mn)
        for r in agg.read(spark).collect()
    }


@pytest.fixture(
    params=["delta", "iceberg", "delta-mor", "iceberg-mor"]
)
def any_src(request, tmp_path, spark):
    """Both formats, both write postures — rolling maintenance reads
    the base pinned at the slice version, so CoW and MOR CDC slices
    must produce the identical view."""
    mor = request.param.endswith("-mor")
    if request.param.startswith("delta"):
        from aligned_spark.sources.delta import DeltaSource

        s = DeltaSource(path=str(tmp_path / "base"), merge_on_read=mor)
    else:
        from aligned_spark.sources.iceberg import IcebergSource

        s = IcebergSource(
            path=str(tmp_path / "base"), merge_on_read=mor
        )
    return s


def test_rolling_ivm_mixed_ops(spark, any_src, tmp_path):
    src = any_src
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (0, "a", 1, 1.0),
                    (1, "a", 5, 2.0),
                    (2, "a", 12, 3.0),
                    (3, "a", 30, 4.0),
                    (4, "b", 7, 5.0),
                    (5, "b", 9, 6.0),
                ]
            )
        ).coalesce(1)
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    agg.refresh(spark)  # full build
    assert _maintained(spark, agg) == _direct(spark, src)
    assert agg.refresh(spark) is None  # already current

    # pure insert: k=6 lands between k=1 and k=2 — k=2's (and only
    # k=2's) trailing frame gains it
    src.insert(
        spark.createDataFrame(_mk_rows([(6, "a", 8, 10.0)]))
    )
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)

    # update that MOVES a row (ts 5 -> 25) and changes its value:
    # both the old neighborhood (k=2,6 lose it) and the new one
    # (k=3 gains it) recompute
    src.upsert(
        spark.createDataFrame(_mk_rows([(1, "a", 25, 20.0)])),
        keys=["k"],
    )
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)

    # delete the stored min of entity b's later frames
    src.delete_where(spark, F.col("k") == 4)
    agg.refresh(spark)
    got = _maintained(spark, agg)
    assert got == _direct(spark, src)
    assert 4 not in got

    # delete an entire entity
    src.delete_where(spark, F.col("g") == "b")
    agg.refresh(spark)
    got = _maintained(spark, agg)
    assert got == _direct(spark, src)
    assert all(v[0] != "b" for v in got.values())


def test_rolling_ivm_entity_move(spark, tmp_path):
    """An update that changes the ENTITY recomputes both entities'
    touched spans."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [(0, "a", 1, 1.0), (1, "a", 5, 2.0), (2, "b", 6, 3.0)]
            )
        ).coalesce(1)
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    src.upsert(
        spark.createDataFrame(_mk_rows([(1, "b", 5, 2.0)])),
        keys=["k"],
    )
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)


def test_rolling_ivm_null_ts_rejected(spark, tmp_path):
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(_mk_rows([(0, "a", 1, 1.0)])).coalesce(1)
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    src.insert(
        spark.createDataFrame(
            [Row(k=1, g="a", ts=None, x=2.0)],
            "k bigint, g string, ts timestamp, x double",
        )
    )
    with pytest.raises(ValueError, match="NULL"):
        agg.refresh(spark)


def test_rolling_ivm_untouched_entity_parts_not_rewritten(
    spark, tmp_path
):
    """Scale pin: a 1-entity slice must not rewrite the other
    entity's target parts (MERGE touches only matched-key parts, and
    the span join keeps the recompute entity-exact)."""
    import os

    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows([(0, "a", 1, 1.0), (1, "b", 5, 2.0)])
        ).repartition(2, "g")
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    log = DeltaLog(str(tmp_path / "agg"))
    before = set(log.snapshot().files)
    src.insert(spark.createDataFrame(_mk_rows([(2, "a", 3, 9.0)])))
    agg.refresh(spark)
    after = log.snapshot().files
    survivors = before & set(after)
    # at least one pre-refresh part (the b-only one) survived whole
    assert survivors, "untouched parts must carry over, not rewrite"
    assert _maintained(spark, agg) == _direct(spark, src)


def test_rolling_ivm_supports_every_batch_agg_kind(spark, tmp_path):
    """The refresh re-uses the batch rolling operator verbatim, so
    every AggSpec kind it supports over a moving frame (exact
    count_distinct via collect_list, approx percentile) maintains
    for free — pin that with a mixed-kind spec."""
    from aligned_spark.operators.aggregate import (
        AggSpec,
        rolling_aggregate,
    )
    from aligned_spark.operators.incremental import (
        RollingIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    aggs = [
        AggSpec("nd", "count_distinct", "x"),
        AggSpec("p50", "percentile", "x", percentile=0.5, approx=True),
        AggSpec("s", "sum", "x"),
    ]
    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (0, "a", 1, 1.0),
                    (1, "a", 5, 2.0),
                    (2, "a", 8, 2.0),
                    (3, "a", 12, 3.0),
                ]
            )
        ).coalesce(1)
    )
    agg = RollingIncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        row_keys=["k"],
        group_keys=["g"],
        ts_col="ts",
        window_seconds=_W,
        aggs=aggs,
    )
    agg.refresh(spark)
    src.upsert(
        spark.createDataFrame(_mk_rows([(1, "a", 6, 9.0)])),
        keys=["k"],
    )
    src.delete_where(spark, F.col("k") == 2)
    agg.refresh(spark)

    def snap(df):
        return {
            r.k: (r.nd, r.p50, r.s) for r in df.collect()
        }

    assert snap(agg.read(spark)) == snap(
        rolling_aggregate(src.read(spark), ["g"], "ts", _W, aggs)
    )


def test_rolling_ivm_distant_changes_split_into_islands(
    spark, tmp_path
):
    """Backfill shape: same-entity changes far apart in one slice
    must produce SEPARATE spans (gap > 2w) — the [min, max] span
    would recompute the whole gap between them — and the refresh
    must stay exact."""
    import datetime as dt

    from aligned_spark.sources.delta import DeltaSource

    def _t(day, minute):
        return dt.datetime(2024, 1, day, 0, minute, 0)

    rows = [
        Row(k=k, g="a", ts=_t(d, m), x=float(k))
        for k, (d, m) in enumerate(
            [(1, 0), (1, 5), (10, 0), (10, 5), (20, 0)]
        )
    ]
    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(spark.createDataFrame(rows).coalesce(1))
    agg = _mk_agg(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    # one slice touching day 1 AND day 20 (gap >> 2w = 20 min)
    src.upsert(
        spark.createDataFrame(
            [
                Row(k=0, g="a", ts=_t(1, 2), x=100.0),
                Row(k=4, g="a", ts=_t(20, 1), x=200.0),
            ]
        ),
        keys=["k"],
    )
    # the span frame itself: two islands for entity a
    changes = src.read_changes(spark, 0, 1).filter(
        F.col("_commit_version") == 1
    )
    spans = agg._touched_spans(
        changes,
        dt.datetime(2024, 1, 1, 0, 2),
        dt.datetime(2024, 1, 20, 0, 1),
        int(_W * 1_000_000),
    )
    assert spans.count() >= 2, "distant changes must split spans"
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)


def test_rolling_maintain_continuously_e2e(spark, tmp_path):
    """Continuous rolling IVM over the CDF stream: the throttled
    initial snapshot bootstraps the view (span recompute IS the full
    build — idempotent across continuation slices), later
    micro-batches fold mutations, replays no-op via the batch-id
    txn."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (i, "a" if i % 2 else "b", i * 3, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(4)
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = agg.maintain_continuously(
            spark, ckpt, max_files_per_trigger=1
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    drain()  # 4-file snapshot drains as several micro-batches
    assert _maintained(spark, agg) == _direct(spark, src)
    src.upsert(
        spark.createDataFrame(_mk_rows([(3, "a", 45, 99.0)])),
        keys=["k"],
    )
    src.delete_where(spark, F.col("k") == 2)
    drain()
    assert _maintained(spark, agg) == _direct(spark, src)
    # replay: nothing changes
    before = _maintained(spark, agg)
    drain()
    assert _maintained(spark, agg) == before


def test_rolling_stream_then_poll_refresh(spark, tmp_path):
    """A poll refresh() after streaming picks up from the stream's
    cursor (interchangeable txns), and a later stream drain skips
    the refresh-covered slice (vmax < cursor is a cost guard; a
    redelivered equal-version slice is idempotent regardless)."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows([(0, "a", 1, 1.0), (1, "a", 5, 2.0)])
        ).coalesce(1)
    )
    agg = _mk_agg(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = agg.maintain_continuously(spark, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    drain()
    src.insert(spark.createDataFrame(_mk_rows([(2, "a", 7, 3.0)])))
    assert agg.refresh(spark) is not None  # poll covers the insert
    assert _maintained(spark, agg) == _direct(spark, src)
    drain()  # stream redelivers the refresh-covered commit: no-op
    assert _maintained(spark, agg) == _direct(spark, src)


# ------------------------------------------------ hypothesis property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "upsert", "delete"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=11),  # key
                st.integers(min_value=0, max_value=59),  # minute
            ),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        ),
    ),
    min_size=1,
    max_size=3,
)


@pytest.fixture(scope="module")
def rivm_tmp_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("rivmprop"))


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(script=_ops)
def test_rolling_ivm_matches_direct_for_any_op_sequence(
    spark, rivm_tmp_dir, script
):
    """Property: for ANY append/upsert/delete sequence — span moves,
    extremum churn, emptied entities — the maintained per-row rolling
    view equals the batch rolling operator after EVERY refresh."""
    from aligned_spark.sources.delta import DeltaSource

    base = f"{rivm_tmp_dir}/{_uuid.uuid4().hex}"
    src = DeltaSource(path=f"{base}/base")
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (i, "a" if i % 2 else "b", i * 5, float(i))
                    for i in range(8)
                ]
            )
        ).coalesce(1)
    )
    agg = _mk_agg(src, f"{base}/agg")
    agg.refresh(spark)
    live = set(range(8))
    for op, rows in script:
        keys = [k for k, _ in rows]
        if op == "append":
            fresh = [
                (k, "a" if k % 2 else "b", m, float(k + m))
                for k, m in rows
                if k not in live
            ]
            if not fresh:
                continue
            src.insert(spark.createDataFrame(_mk_rows(fresh)))
            live |= {k for k, *_ in fresh}
        elif op == "upsert":
            src.upsert(
                spark.createDataFrame(
                    _mk_rows(
                        [
                            (k, "a" if m % 2 else "b", m, float(m))
                            for k, m in rows
                        ]
                    )
                ),
                keys=["k"],
            )
            live |= set(keys)
        else:
            hit = [k for k in keys if k in live]
            if not hit:
                continue
            src.delete_where(spark, F.col("k").isin(hit))
            live -= set(hit)
        agg.refresh(spark)
        assert _maintained(spark, agg) == _direct(spark, src)
