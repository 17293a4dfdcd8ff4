"""Native streaming source over the pure-Python Delta/Iceberg logs
(`streaming/table_stream.py`) — the Structured-Streaming expression
of the reference's polling ingest loop (aligned/worker.py:150-242).

Covers: append tailing matches batch reads, checkpoint restart is
exactly-once, non-append commits fail fast (delta-spark parity) and
re-emit under ignoreChanges, compaction is invisible, schema
evolution mid-stream projects nulls for old parts, and
maxFilesPerTrigger splits micro-batches without changing results.
"""

from __future__ import annotations

import os

import pytest

from aligned_spark.sources.delta_log import DeltaLog
from aligned_spark.sources.iceberg_log import IcebergLog
from aligned_spark.streaming.sources import TableStreamSource


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


def test_delta_stream_matches_batch_and_resumes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id", "id * 2 as v", "cast(id % 3 as string) as p"
    )
    log.write(mk(0, 10), mode="overwrite", partition_by=["p"])
    log.write(mk(10, 20), mode="append", partition_by=["p"])

    src = TableStreamSource(path=tbl, table_format="delta")
    sdf = src.read_stream(spark)
    assert sdf.isStreaming
    assert [f.name for f in sdf.schema.fields] == ["id", "v", "p"]

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    # partition columns materialize from the log's partitionValues
    assert got.filter("v = id * 2 and p = cast(id % 3 as string)").count() == 20
    assert sorted(r.id for r in got.select("id").collect()) == list(range(20))

    # append while stopped; restart from the checkpoint: no replays
    log.write(mk(20, 25), mode="append", partition_by=["p"])
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert got.count() == 25 == got.distinct().count()


def test_delta_change_commit_raises_then_ignore_changes(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id", "id as v"))
    log.merge_upsert(
        spark.createDataFrame([(3, 99)], "id long, v long"), ["id"]
    )

    # explicit full-history replay (startingVersion=0) hits the MERGE
    # commit and fails fast; the DEFAULT start (current snapshot)
    # would serve the post-merge rows without replaying the rewrite
    src = TableStreamSource(
        path=tbl, table_format="delta", starting_version=0
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="append-only|ignoreChanges"):
        q.processAllAvailable()
    q.stop()

    src2 = TableStreamSource(
        path=tbl,
        table_format="delta",
        starting_version=0,
        ignore_changes=True,
    )
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(src2.read_stream(spark), out2, ckpt2)
    got = spark.read.parquet(out2)
    # the rewrite re-emits its surviving rows: the updated row is
    # present; consumers dedup on keys (documented delta semantics)
    assert got.filter("id = 3 and v = 99").count() == 1
    assert got.select("id").distinct().count() == 10


def test_iceberg_stream_appends_and_skips_compaction(spark, tmp_path):
    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr(
        "id", "cast(id % 3 as int) as p"
    )
    log.write(mk(0, 10), mode="append", partition_by=["p"])
    log.write(mk(10, 20), mode="append", partition_by=["p"])
    src = TableStreamSource(path=tbl, table_format="iceberg")
    sdf = src.read_stream(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(sdf, out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(20))
    assert got.filter("p = cast(id % 3 as int)").count() == 20

    # compaction rewrites every file but changes no rows — invisible
    log.optimize(spark)
    log.write(mk(20, 22), mode="append", partition_by=["p"])
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema(sdf.schema).parquet(out)
    assert got.count() == 22 == got.distinct().count()

    # a MERGE snapshot raises without ignoreChanges
    log.merge_upsert(
        spark.createDataFrame([(5, 77)], "id long, p int"), keys=["id"]
    )
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    with pytest.raises(Exception, match="append-only|ignoreChanges"):
        q.processAllAvailable()
    q.stop()


def test_delta_schema_evolution_mid_stream(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 5).selectExpr("id"))
    src = TableStreamSource(path=tbl, table_format="delta")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)

    log.write(
        spark.range(5, 8).selectExpr("id", "id * 10 as extra"),
        merge_schema=True,
    )
    sdf = TableStreamSource(path=tbl, table_format="delta").read_stream(
        spark
    )
    assert [f.name for f in sdf.schema.fields] == ["id", "extra"]
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .option("mergeSchema", "true")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert got.count() == 8
    assert got.filter("extra is not null").count() == 3


def test_delta_starting_latest_and_max_files_per_trigger(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 100).selectExpr("id"))  # pre-existing

    # tail-only: the snapshot at stream start is skipped
    src = TableStreamSource(
        path=tbl, table_format="delta", starting_version="latest"
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert spark.read.schema("id long").parquet(out).count() == 0 or not files

    for lo in (100, 110, 120):
        log.write(spark.range(lo, lo + 10).selectExpr("id"))
    # admission control: one version per trigger (each commit is one
    # file here), so draining takes >= 3 micro-batches
    src2 = TableStreamSource(
        path=tbl,
        table_format="delta",
        starting_version="latest",
        max_files_per_trigger=1,
    )
    # note: starting latest here would skip the three appends — use
    # the existing checkpoint (offset = version 0) instead
    q = (
        src2.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    q.awaitTermination()
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(100, 130))
    assert n_batches >= 3
