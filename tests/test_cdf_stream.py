"""Streaming change-data-feed (`streaming/cdf_stream.py`) —
``readChangeFeed`` on the native ``aligned_table`` source.

The contract under test is STREAM ≡ BATCH-CDC: draining the change
stream over any commit sequence must produce exactly
``DeltaLog.read_cdf`` of the same version range (the oracle-verified
batch reconstruction), with public Delta CDF columns. Plus: default
start serves the current snapshot as ``insert`` rows then streams
changes, checkpoint restart is exactly-once, and compaction stays
invisible.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aligned_spark.sources.delta_log import DeltaLog
from aligned_spark.streaming.table_stream import register


def _cdf_stream(spark, tbl, **opts):
    register(spark)
    r = (
        spark.readStream.format("aligned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _drain(sdf, out: str, ckpt: str):
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return q


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_cdf_stream_equals_batch_cdc_cow_and_mor(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(
        spark.range(0, 40).selectExpr(
            "id", "id * 2 as v", "cast(id % 2 as string) as p"
        ),
        partition_by=["p"],
    )
    # keyed copy-on-write MERGE (update + insert)
    log.merge_upsert(
        spark.createDataFrame(
            [(3, 99, "1"), (100, 1, "0")], "id long, v long, p string"
        ),
        ["id"],
    )
    # merge-on-read delete (position-delete sidecar)
    log.delete_where_mor(spark, F.col("id") % 10 == 0)
    # keyless copy-on-write partition replacement (rides the
    # recorded merge keys -> true update pairs)
    part = spark.range(0, 40).filter("id % 2 = 1")
    log.replace_where(
        part.selectExpr("id", "id * 5 as v", "'1' as p"),
        F.col("p") == "1",
    )
    # merge-on-read MERGE (pairs + appended parts in one commit)
    log.merge_upsert_mor(
        spark.createDataFrame(
            [(5, -5, "1"), (200, 7, "0")], "id long, v long, p string"
        ),
        ["id"],
    )

    sdf = _cdf_stream(spark, tbl, startingVersion=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    batch = log.read_cdf(spark, 0)
    assert _rows(got) == _rows(batch)
    # sanity: every change family appeared
    kinds = {r["_change_type"] for r in got.select("_change_type").collect()}
    assert kinds == {
        "insert",
        "delete",
        "update_preimage",
        "update_postimage",
    }


def test_cdf_stream_default_serves_snapshot_then_changes(
    spark, tmp_path
):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id", "id as v"))
    log.merge_upsert(
        spark.createDataFrame([(3, 99)], "id long, v long"), ["id"]
    )
    v0 = log.latest_version()

    sdf = _cdf_stream(spark, tbl)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    # initial snapshot: live rows as inserts at the pinned version
    live = log.read(spark).withColumn(
        "_change_type", F.lit("insert")
    ).withColumn("_commit_version", F.lit(v0).cast("long"))
    assert _rows(got) == _rows(live)

    # later commits stream as true row-level changes
    log.delete_where(spark, F.col("id") == 5)
    _drain(_cdf_stream(spark, tbl), out, ckpt)
    got2 = spark.read.schema(sdf.schema).parquet(out)
    tail = log.read_cdf(spark, v0)
    assert _rows(got2) == sorted(_rows(live) + _rows(tail))


def test_cdf_stream_exactly_once_restart_and_throttle(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id", "id as v"))
    for lo in (10, 20, 30):
        log.write(spark.range(lo, lo + 10).selectExpr("id", "id as v"))
    log.merge_upsert(
        spark.createDataFrame([(7, -7)], "id long, v long"), ["id"]
    )

    sdf = _cdf_stream(
        spark, tbl, startingVersion=1, maxFilesPerTrigger=1
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain(sdf, out, ckpt)
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    assert n_batches >= 4  # one version per trigger over the backlog
    got = spark.read.schema(sdf.schema).parquet(out)
    assert _rows(got) == _rows(log.read_cdf(spark, 0))

    # restart from the checkpoint: new commits only, no replays
    log.delete_where(spark, F.col("id") == 0)
    _drain(_cdf_stream(spark, tbl, startingVersion=1), out, ckpt)
    got2 = spark.read.schema(sdf.schema).parquet(out)
    assert _rows(got2) == _rows(log.read_cdf(spark, 0))


def test_cdf_stream_skips_compaction(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 20).selectExpr("id", "id as v"))
    log.delete_where_mor(spark, F.col("id") < 5)
    sdf = _cdf_stream(spark, tbl, startingVersion=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    before = _rows(spark.read.schema(sdf.schema).parquet(out))

    # OPTIMIZE rewrites every part and materializes the MOR deletes
    # (dataChange=false): the change stream must emit NOTHING
    log.optimize(spark)
    _drain(_cdf_stream(spark, tbl, startingVersion=1), out, ckpt)
    after = _rows(spark.read.schema(sdf.schema).parquet(out))
    assert after == before


def test_cdf_stream_unkeyed_rewrite_delete_insert(spark, tmp_path):
    # no MERGE ever ran -> no recorded keys: the rewrite falls back
    # to whole-row multiset difference (delete+insert, exactly-once)
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 30).selectExpr("id", "id as v"))
    log.delete_where(spark, F.col("id") % 3 == 0)
    sdf = _cdf_stream(spark, tbl, startingVersion=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert _rows(got) == _rows(log.read_cdf(spark, 0))
    assert (
        got.filter("_change_type = 'delete'").count() == 10
        and got.count() == 10
    )


def _ice_cdf_stream(spark, tbl, **opts):
    register(spark)
    r = (
        spark.readStream.format("aligned_table")
        .option("path", tbl)
        .option("format", "iceberg")
        .option("readChangeFeed", "true")
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_cdf_stream_iceberg_equals_batch_cdc(spark, tmp_path):
    from aligned_spark.sources.iceberg_log import IcebergLog

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(
        spark.range(0, 40).selectExpr(
            "id", "id * 2 as v", "cast(id % 2 as int) as p"
        ),
        partition_by=["p"],
    )
    first = log.snapshot_ids()[0]
    # keyed copy-on-write MERGE
    log.merge_upsert(
        spark.createDataFrame(
            [(3, 99, 1), (100, 1, 0)], "id long, v long, p int"
        ),
        keys=["id"],
    )
    # merge-on-read delete (position-delete file)
    log.delete_where_mor(spark, F.col("id") % 10 == 0)
    # compaction must stay invisible
    log.optimize(spark)
    # post-compaction append
    log.write(
        spark.createDataFrame([(200, 7, 0)], "id long, v long, p int"),
        mode="append",
        partition_by=["p"],
    )
    second = log.snapshot_ids()[1]

    sdf = _ice_cdf_stream(spark, tbl, startingSnapshotId=second)
    assert "_snapshot_id" in sdf.schema.fieldNames()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    batch = log.read_changes(spark, first)
    assert _rows(got) == _rows(batch)
    kinds = {
        r["_change_type"]
        for r in got.select("_change_type").collect()
    }
    assert kinds == {
        "insert",
        "delete",
        "update_preimage",
        "update_postimage",
    }


def test_cdf_stream_iceberg_default_snapshot_then_changes(
    spark, tmp_path
):
    from aligned_spark.sources.iceberg_log import IcebergLog

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 12).selectExpr("id", "id as v"))
    log.merge_upsert(
        spark.createDataFrame([(3, 99)], "id long, v long"),
        keys=["id"],
    )
    cur = log.snapshot_ids()[-1]

    sdf = _ice_cdf_stream(spark, tbl)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    live = (
        log.read(spark)
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_snapshot_id", F.lit(cur).cast("long"))
    )
    assert _rows(got) == _rows(live)

    # later snapshots stream as true row-level changes
    log.delete_where(spark, F.col("id") == 5)
    _drain(_ice_cdf_stream(spark, tbl), out, ckpt)
    got2 = spark.read.schema(sdf.schema).parquet(out)
    tail = log.read_changes(spark, cur)
    assert _rows(got2) == sorted(_rows(live) + _rows(tail))


# ------------------------------------------------------------------
# continuous IVM: commit log -> CDF stream -> foreachBatch ->
# IncrementalAggregate.apply_changes (VERDICT r8 task 2)
# ------------------------------------------------------------------


def test_continuous_ivm_over_cdf_stream(spark, tmp_path):
    from pyspark.sql import Row

    from aligned_spark.operators.incremental import IncrementalAggregate
    from aligned_spark.sources.delta import DeltaSource

    base = str(tmp_path / "base")
    src = DeltaSource(path=base)
    src.insert(
        spark.createDataFrame(
            [
                Row(k=1, g="a", x=10.0),
                Row(k=2, g="a", x=3.0),
                Row(k=3, g="b", x=7.0),
                Row(k=4, g="b", x=20.0),
            ]
        ).coalesce(1)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        maxs=["x"],
        distincts=["x"],
    )

    def direct():
        return sorted(
            map(
                tuple,
                src.read(spark)
                .groupBy("g")
                .agg(
                    F.count("*").alias("n_rows"),
                    F.sum("x").alias("x"),
                    F.min("x").alias("min_x"),
                    F.max("x").alias("max_x"),
                    F.countDistinct("x").alias("n_distinct_x"),
                )
                .collect(),
            )
        )

    def maintained():
        return sorted(
            map(
                tuple,
                agg.read(spark)
                .select(
                    "g", "n_rows", "x", "min_x", "max_x",
                    "n_distinct_x",
                )
                .collect(),
            )
        )

    ckpt = str(tmp_path / "ckpt")
    sdf = _cdf_stream(spark, base)  # default: snapshot, then tail

    def run_stream():
        q = (
            sdf.writeStream.foreachBatch(
                lambda bdf, bid: agg.apply_changes(spark, bdf)
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    # micro-batch 1: the initial snapshot becomes the full build
    run_stream()
    assert maintained() == direct()

    # micro-batch 2: append folds in monotonically
    src.insert(
        spark.createDataFrame(
            [Row(k=5, g="a", x=1.0), Row(k=6, g="c", x=4.0)]
        ).coalesce(1)
    )
    run_stream()
    assert maintained() == direct()

    # micro-batch 3: keyed MERGE (update pre/post pair)
    src.upsert(
        spark.createDataFrame([Row(k=4, g="b", x=2.0)]), keys=["k"]
    )
    run_stream()
    assert maintained() == direct()

    # micro-batch 4: delete removes group-a's stored MIN (x=1.0) ->
    # the hybrid path must recompute that group's extrema from base
    src.delete_where(spark, F.col("k") == 5)
    run_stream()
    assert maintained() == direct()

    # replay safety: re-running the drained stream changes nothing
    before = maintained()
    run_stream()
    assert maintained() == before


def test_maintain_continuously_one_call(spark, tmp_path):
    """The one-call wiring: maintain_continuously starts the CDF
    stream + foreachBatch pipeline; bootstrap, folds, and restarts
    are exactly-once."""
    from pyspark.sql import Row

    from aligned_spark.operators.incremental import IncrementalAggregate
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            [Row(k=i, g=str(i % 2), x=float(i)) for i in range(8)]
        ).coalesce(1)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = agg.maintain_continuously(spark, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    drain()
    src.upsert(
        spark.createDataFrame([Row(k=2, g="1", x=99.0)]), keys=["k"]
    )
    drain()
    direct = sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("x").alias("x"))
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            agg.read(spark).select("g", "n_rows", "x").collect(),
        )
    )
    assert got == direct


def test_store_stream_changes_live_feed(spark, tmp_path):
    """store.stream_changes: the materialized view's table tailed as
    a LIVE row-level change feed — a drained stream sees the
    snapshot as inserts, and a later materialize_incremental's
    upsert arrives as true changes (never the surviving
    co-residents of rewritten parts)."""
    import datetime as dt

    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
    )
    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    base = ParquetSource(path=str(tmp_path / "base.parquet"))
    mat = DeltaSource(path=str(tmp_path / "mat"))
    schema = "user_id long, ts timestamp, value double"
    t = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [(i, t, float(i)) for i in range(1, 51)], schema
    ).coalesce(1).write.parquet(base.path)

    @feature_view(
        name="live_mat", source=base, materialized_source=mat
    )
    class LiveMat:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

    store = ContractStore(spark)
    store.add_view(LiveMat)
    store.materialize("live_mat")

    sdf = store.stream_changes("live_mat")
    assert sdf.isStreaming
    assert "_change_type" in sdf.schema.fieldNames()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert got.count() == 50
    assert (
        got.select("_change_type").distinct().collect()[0][0]
        == "insert"
    )

    # one late row -> incremental refresh -> the live feed carries
    # exactly that row, not the rewritten part's co-residents
    spark.createDataFrame(
        [(999, dt.datetime(2024, 1, 6), 5.0)], schema
    ).write.mode("append").parquet(base.path)
    store.materialize_incremental("live_mat")
    _drain(store.stream_changes("live_mat"), out, ckpt)
    got2 = spark.read.schema(sdf.schema).parquet(out)
    assert got2.count() == 51
    assert got2.filter("user_id = 999").count() == 1


def test_cdf_stream_schema_evolution_mid_stream(spark, tmp_path):
    """Schema pins at query start (delta-spark streaming semantics):
    an evolved commit's NEW column is invisible until the query
    restarts with the fresh schema, but its rows still stream
    correctly projected to the pinned columns; a restart reads the
    evolved schema with NULLs for old parts."""
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 5).selectExpr("id", "id as v"))
    sdf = _cdf_stream(spark, tbl, startingVersion=0)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)

    log.write(
        spark.range(5, 8).selectExpr("id", "id as v", "id * 10 as extra"),
        merge_schema=True,
    )
    _drain(_cdf_stream(spark, tbl, startingVersion=0), out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert got.count() == 8  # evolved rows arrive, pinned columns
    assert "extra" not in got.columns

    # a fresh query sees the evolved schema; old rows project NULL
    sdf2 = _cdf_stream(spark, tbl, startingVersion=0)
    assert "extra" in sdf2.schema.fieldNames()
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(sdf2, out2, ckpt2)
    got2 = spark.read.schema(sdf2.schema).parquet(out2)
    assert got2.count() == 8
    assert got2.filter("extra is not null").count() == 3
    assert got2.filter("id < 5 and extra is null").count() == 5
