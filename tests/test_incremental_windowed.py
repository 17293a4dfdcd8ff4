"""Time-windowed IVM (`WindowedIncrementalAggregate`): a
materialized hopping/tumbling window aggregate maintained from the
CDC feed equals a direct `F.window` group-by over the base after any
op sequence (reference flagship: AggregationTimeWindow,
aligned/schemas/derivied_feature.py:80-88)."""

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


def _direct(spark, src, window="10 minutes", slide=None):
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return {
        (r.g, r.ws): (r.n, r.x, r.mn)
        for r in src.read(spark)
        .groupBy("g", win.alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("x"),
            F.min("x").alias("mn"),
        )
        .select("g", F.col("__w.start").alias("ws"), "n", "x", "mn")
        .collect()
    }


def _maintained(spark, agg):
    return {
        (r.g, r.window_start): (r.n_rows, r.x, r.min_x)
        for r in agg.read(spark).collect()
    }


def test_tumbling_windowed_ivm_mixed_ops(spark, tmp_path):
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (0, "a", 1, 1.0),
                    (1, "a", 5, 2.0),
                    (2, "a", 12, 3.0),
                    (3, "b", 7, 4.0),
                    (4, "b", 25, 5.0),
                ]
            )
        ).coalesce(1)
    )
    agg = WindowedIncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        ts_col="ts",
        window_seconds=600.0,
    )
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)

    # upsert: k=1 moves window (minute 5 -> 15) AND changes value
    src.upsert(
        spark.createDataFrame(_mk_rows([(1, "a", 15, 20.0)])),
        keys=["k"],
    )
    agg.refresh(spark)
    assert _maintained(spark, agg) == _direct(spark, src)

    # delete the stored MIN of (a, window 0-10) -> touched-pair
    # recompute; also empties nothing
    src.delete_where(spark, F.col("k") == 0)
    agg.refresh(spark)
    got = _maintained(spark, agg)
    assert got == _direct(spark, src)

    # delete the only row of a window -> that (g, window) vanishes
    src.delete_where(spark, F.col("k") == 4)
    agg.refresh(spark)
    got = _maintained(spark, agg)
    assert got == _direct(spark, src)
    assert not any(
        ws == dt.datetime(2024, 1, 10, 0, 20) and g == "b"
        for g, ws in got
    )


def test_hopping_windows_match_spark_window(spark, tmp_path):
    """A row explodes into window/slide buckets; bucket boundaries
    must match Spark's own F.window(ts, period, slide)."""
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (0, "a", 0, 1.0),
                    (1, "a", 4, 2.0),
                    (2, "a", 9, 3.0),
                    (3, "b", 14, 4.0),
                    (4, "b", 59, 5.0),
                ]
            )
        ).coalesce(1)
    )
    agg = WindowedIncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        ts_col="ts",
        window_seconds=600.0,
        slide_seconds=300.0,
    )
    agg.refresh(spark)
    direct = _direct(
        spark, src, window="10 minutes", slide="5 minutes"
    )
    got = {
        (r.g, r.window_start): (r.n_rows, r.x)
        for r in agg.read(spark).collect()
    }
    assert got == {k: (v[0], v[1]) for k, v in direct.items()}

    src.upsert(
        spark.createDataFrame(_mk_rows([(1, "b", 31, 9.0)])),
        keys=["k"],
    )
    agg.refresh(spark)
    direct = _direct(
        spark, src, window="10 minutes", slide="5 minutes"
    )
    got = {
        (r.g, r.window_start): (r.n_rows, r.x)
        for r in agg.read(spark).collect()
    }
    assert got == {k: (v[0], v[1]) for k, v in direct.items()}


def test_window_not_multiple_of_slide_rejected(spark, tmp_path):
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    with pytest.raises(ValueError, match="multiple"):
        WindowedIncrementalAggregate(
            source=DeltaSource(path=str(tmp_path / "b")),
            target_path=str(tmp_path / "a"),
            group_keys=["g"],
            sums=["x"],
            window_seconds=600.0,
            slide_seconds=400.0,
        )


def test_windowed_maintain_continuously_e2e(spark, tmp_path):
    """Continuous windowed IVM over the CDF stream: bootstrap from
    the snapshot, fold micro-batches, survive a throttled restart."""
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [(i, "a" if i % 2 else "b", i * 3, float(i)) for i in range(8)]
            )
        ).coalesce(1)
    )
    agg = WindowedIncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        ts_col="ts",
        window_seconds=600.0,
    )
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

    drain()
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


# ------------------------------------------------ hypothesis property

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "upsert", "delete"]),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=14),  # key
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
def wivm_tmp_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wivmprop"))


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(script=_ops)
def test_windowed_ivm_matches_direct_for_any_op_sequence(
    spark, wivm_tmp_dir, script
):
    """Property: for ANY append/upsert/delete sequence — window
    moves, extremum churn, emptied (entity, window) pairs — the
    maintained hopping-window aggregate equals a direct F.window
    group-by after EVERY refresh."""
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    base = f"{wivm_tmp_dir}/{_uuid.uuid4().hex}"
    src = DeltaSource(path=f"{base}/base")
    src.insert(
        spark.createDataFrame(
            _mk_rows(
                [
                    (i, "a" if i % 2 else "b", i * 4, float(i))
                    for i in range(8)
                ]
            )
        ).coalesce(1)
    )
    agg = WindowedIncrementalAggregate(
        source=src,
        target_path=f"{base}/agg",
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        maxs=["x"],
        ts_col="ts",
        window_seconds=600.0,
        slide_seconds=300.0,
    )
    agg.refresh(spark)

    def direct():
        return {
            (r.g, r.ws): (r.n, r.x, r.mn, r.mx)
            for r in src.read(spark)
            .groupBy(
                "g",
                F.window("ts", "10 minutes", "5 minutes").alias(
                    "__w"
                ),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("x"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
            )
            .select(
                "g", F.col("__w.start").alias("ws"), "n", "x", "mn", "mx"
            )
            .collect()
        }

    def maintained():
        return {
            (r.g, r.window_start): (r.n_rows, r.x, r.min_x, r.max_x)
            for r in agg.read(spark).collect()
        }

    assert maintained() == direct()
    existing = set(range(8))
    for step, (op, pairs) in enumerate(script):
        if op == "append":
            fresh = [(k, m) for k, m in pairs if k not in existing]
            if not fresh:
                continue
            src.insert(
                spark.createDataFrame(
                    _mk_rows(
                        [
                            (k, "a" if (k + step) % 2 else "b", m, float(step * 50 - k))
                            for k, m in fresh
                        ]
                    )
                )
            )
            existing.update(k for k, _ in fresh)
        elif op == "upsert":
            src.upsert(
                spark.createDataFrame(
                    _mk_rows(
                        [
                            (k, "b" if (k + step) % 2 else "a", m, float((step - 1) * 500 + k))
                            for k, m in pairs
                        ]
                    )
                ),
                keys=["k"],
            )
            existing.update(k for k, _ in pairs)
        else:
            keys = [int(k) for k, _ in pairs]
            src.delete_where(spark, F.col("k").isin(keys))
            existing -= set(keys)
        agg.refresh(spark)
        assert maintained() == direct(), (step, op, pairs)
