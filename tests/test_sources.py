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
