"""Source combinator + catalog source tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aligned_spark.sources.catalog import TableSource
from aligned_spark.sources.combinators import (
    FilteredSource,
    JoinAsofSource,
    LoadedAtSource,
    StackedSource,
    TransformSource,
)
from aligned_spark.sources.in_memory import InMemorySource


def _src(data, schema):
    return InMemorySource.from_dict(data, schema=schema)


def test_filtered_and_transform_sources(spark):
    base = _src({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}, "k int, v double")
    filtered = FilteredSource(base, F.col("v") > 15.0)
    assert filtered.read(spark).count() == 2

    doubled = TransformSource(base, lambda df: df.withColumn("v", F.col("v") * 2))
    assert {r.v for r in doubled.read(spark).collect()} == {20.0, 40.0, 60.0}


def test_stacked_and_loaded_at_sources(spark):
    a = _src({"k": [1], "v": [1.0]}, "k int, v double")
    b = _src({"k": [2], "v": [2.0]}, "k int, v double")
    stacked = StackedSource([a, b], source_column="origin", source_names=["a", "b"])
    rows = {(r.k, r.origin) for r in stacked.read(spark).collect()}
    assert rows == {(1, "a"), (2, "b")}

    loaded = LoadedAtSource(a)
    row = loaded.read(spark).collect()[0]
    assert row.loaded_at is not None


def test_join_asof_source(spark):
    t = dt.datetime
    facts = _src(
        {"k": [1, 1], "ts": [t(2024, 1, 5), t(2024, 1, 10)]},
        "k int, ts timestamp",
    )
    feats = _src(
        {
            "k": [1, 1],
            "fts": [t(2024, 1, 1), t(2024, 1, 7)],
            "v": [10.0, 70.0],
        },
        "k int, fts timestamp, v double",
    )
    src = JoinAsofSource(facts, feats, left_on="ts", right_on="fts", by=["k"])
    rows = {(r.ts.day, r.v) for r in src.read(spark).collect()}
    assert rows == {(5, 10.0), (10, 70.0)}


def test_table_source_roundtrip(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, tag string")
    src = TableSource("aligned_test_tbl")
    try:
        src.overwrite(df)
        assert src.read(spark).count() == 2
        src.upsert(
            spark.createDataFrame([(2, "z"), (3, "w")], "id long, tag string"),
            keys=["id"],
        )
        rows = {r.id: r.tag for r in src.read(spark).collect()}
        assert rows == {1: "x", 2: "z", 3: "w"}
        assert src.freshness(spark, "id") == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS aligned_test_tbl")


def test_materialize_incremental_partitioned(spark, tmp_path):
    """Incremental refresh of a hive-partitioned materialization:
    only partitions containing new rows are rewritten (dynamic
    partition overwrite), proven by the untouched partition's files
    not changing."""
    import datetime as dt
    import os

    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
    )
    from aligned_spark.sources.file import (
        ParquetSource,
        PartitionedParquetSource,
    )
    from aligned_spark.store import ContractStore

    base = ParquetSource(path=str(tmp_path / "base.parquet"))
    mat = PartitionedParquetSource(
        path=str(tmp_path / "mat"), partition_keys=["user_id"]
    )
    schema = "user_id long, ts timestamp, value double"
    t = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [(1, t, 1.0), (2, t, 2.0)], schema
    ).write.parquet(base.path)

    @feature_view(name="inc_view", source=base, materialized_source=mat)
    class IncView:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

        doubled = value * 2.0

    store = ContractStore(spark)
    store.add_view(IncView)
    store.materialize("inc_view")

    p1 = os.path.join(mat.path, "user_id=1")
    files_before = {
        f: os.path.getmtime(os.path.join(p1, f))
        for f in os.listdir(p1)
        if f.endswith(".parquet")
    }

    # new row for user 2 only
    spark.createDataFrame(
        [(2, dt.datetime(2024, 1, 6), 5.0)], schema
    ).write.mode("append").parquet(base.path)
    store.materialize_incremental("inc_view")

    out = mat.read(spark).collect()
    assert len(out) == 3
    got = {(r.user_id, r.value, r.doubled) for r in out}
    assert (2, 5.0, 10.0) in got and (1, 1.0, 2.0) in got
    files_after = {
        f: os.path.getmtime(os.path.join(p1, f))
        for f in os.listdir(p1)
        if f.endswith(".parquet")
    }
    assert files_before == files_after, "untouched partition was rewritten"


def test_materialize_incremental_upsert_fallback(spark, tmp_path):
    """Non-partitioned materialization upserts only rows newer than
    the materialized freshness."""
    import datetime as dt

    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
    )
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    base = ParquetSource(path=str(tmp_path / "b.parquet"))
    mat = ParquetSource(path=str(tmp_path / "m.parquet"))
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5), 1.0)], schema
    ).write.parquet(base.path)

    @feature_view(name="inc_up", source=base, materialized_source=mat)
    class IncUp:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

    store = ContractStore(spark)
    store.add_view(IncUp)
    # no materialization yet -> full build fallback
    store.materialize_incremental("inc_up")
    assert mat.read(spark).count() == 1

    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 7), 3.0)], schema
    ).write.mode("append").parquet(base.path)
    store.materialize_incremental("inc_up")
    rows = {(r.user_id, r.value) for r in mat.read(spark).collect()}
    assert rows == {(1, 1.0), (1, 3.0)}


def test_jdbc_roundtrip_pushdown(spark):
    """JDBC source exercised for real against embedded Derby (the JDBC
    driver Spark ships for its Hive metastore): write via spark-jdbc,
    partitioned parallel read back, and filter + projection pushdown
    reaching the external engine (the Spark-first replacement for the
    reference's 1.4k-LoC psql/redshift SQL codegen,
    ``aligned/psql/jobs.py``)."""
    from aligned_spark.sources.jdbc import JdbcSource

    url = "jdbc:derby:memory:jdbctest;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(20).selectExpr(
        "id", "cast(id * 1.5 as double) as v"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "t1")
        .option("driver", drv)
        .mode("overwrite")
        .save()
    )

    src = JdbcSource(
        url="jdbc:derby:memory:jdbctest",
        table="t1",
        driver=drv,
        partition_column="id",
        lower_bound=0,
        upper_bound=20,
        num_partitions=4,
    )
    out = src.read(spark)
    assert out.rdd.getNumPartitions() == 4
    flt = out.filter("id > 15").select("id")
    plan = flt._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "GreaterThan(id,15)" in plan  # predicate reached the DB
    assert "ReadSchema: struct<id:bigint>" in plan  # projection pruned
    assert sorted(r.id for r in flt.collect()) == [16, 17, 18, 19]


def test_orc_roundtrip(spark, tmp_path):
    from aligned_spark.sources.file import FileSource

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id long, s string, v double",
    )
    src = FileSource.orc(str(tmp_path / "t.orc"))
    src.insert(df)
    back = src.read(spark)
    assert sorted((r.id, r.s, r.v) for r in back.collect()) == [
        (1, "a", 1.5),
        (2, "b", 2.5),
        (3, "c", 3.5),
    ]
    # pushdown reaches the ORC reader like parquet
    plan = back.filter("id = 2").select("s")._jdf.queryExecution().toString()
    assert "PushedFilters: [" in plan


def test_source_level_restore_and_detail(spark, tmp_path):
    from pyspark.sql import Row

    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.iceberg import IcebergSource

    d = DeltaSource(path=str(tmp_path / "d"))
    d.insert(spark.createDataFrame([Row(k=1)]))
    d.insert(spark.createDataFrame([Row(k=2)]))
    assert d.detail()["numRows"] == 2
    d.restore(spark, 0)
    assert d.read(spark).count() == 1

    i = IcebergSource(path=str(tmp_path / "i"))
    i.insert(spark.createDataFrame([Row(k=1)]))
    s0 = i.version()
    i.insert(spark.createDataFrame([Row(k=2)]))
    assert i.detail()["numRows"] == 2
    i.rollback_to(spark, s0)
    assert i.read(spark).count() == 1


def test_joined_source_and_rename_convention(spark):
    """JoinedSource (reference JoinDataSource,
    batch_data_source.py:1342) equi-joins two sources at scan time
    with key renaming; rename_convention (reference Renamer,
    sources/renamer.py:29) maps column naming conventions."""
    from pyspark.sql import Row

    from aligned_spark.sources.combinators import (
        JoinedSource,
        rename_convention,
    )
    from aligned_spark.sources.in_memory import InMemorySource

    left = InMemorySource(
        [Row(k=1, a=10.0), Row(k=2, a=20.0), Row(k=3, a=30.0)]
    )
    right = InMemorySource([Row(rk=1, b="x"), Row(rk=2, b="y")])
    j = JoinedSource(
        left, right, left_on=["k"], right_on=["rk"], method="left"
    )
    rows = {r.k: (r.a, r.b) for r in j.read(spark).collect()}
    assert rows == {1: (10.0, "x"), 2: (20.0, "y"), 3: (30.0, None)}
    inner = JoinedSource(
        left, right, left_on=["k"], right_on=["rk"], method="inner"
    )
    assert inner.read(spark).count() == 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="equal-length"):
        JoinedSource(left, right, left_on=["k"], right_on=[]).read(spark)

    df = spark.createDataFrame(
        [Row(userId=1, eventType="a", ts=2)]
    )
    out = rename_convention(df, "camel_to_snake")
    assert out.columns == ["user_id", "event_type", "ts"]
    back = rename_convention(out, "snake_to_camel")
    assert back.columns == ["userId", "eventType", "ts"]
    pas = rename_convention(out, "snake_to_pascal")
    assert pas.columns == ["UserId", "EventType", "Ts"]
    with _pytest.raises(ValueError, match="unknown renamer"):
        rename_convention(df, "kebab")
