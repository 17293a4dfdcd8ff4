"""Regression tests for the round-9 ADVICE findings.

1. maxFilesPerTrigger was inert on a fresh query's FIRST trigger
   (initialOffset never seeded the throttle state; the runner calls
   latestOffset before initialOffset) — the initial backlog, exactly
   where admission control matters, arrived as one micro-batch.
2. The default startingVersion=0 replayed the full history, so any
   table with a historical overwrite/MERGE/DELETE could not start a
   stream at defaults; delta-spark's default serves the current
   snapshot then tails.
3. Bloom sidecars: an add without footer stats was sized n=0 (a
   saturated 64-bit bloom that never prunes, silently recorded as
   indexed); fpp outside (0, 1) either crashed the write (math
   domain) or emitted the same degenerate filter.
4. vacuum never matched ``.bloom.inprogress`` temp files left by a
   task dying between open and os.replace — they accumulated in
   ``_bloom/`` forever.
"""

from __future__ import annotations

import os
import time

import pytest

from aligned_spark.sources.delta_log import DeltaLog
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


# ------------------------------------------------------------------
# 1. admission control on the fresh-query initial backlog
# ------------------------------------------------------------------


def test_max_files_per_trigger_throttles_fresh_backlog(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    for lo in (0, 10, 20, 30):  # 4-commit backlog, 1 file each
        log.write(spark.range(lo, lo + 10).coalesce(1).selectExpr("id"))
    src = TableStreamSource(
        path=tbl,
        table_format="delta",
        starting_version=0,
        max_files_per_trigger=1,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain(src.read_stream(spark), out, ckpt)
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(40))
    # the regression ingested all 4 commits in ONE first batch
    assert n_batches >= 4


def test_max_files_per_trigger_throttles_initial_snapshot(
    spark, tmp_path
):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 80).repartition(8).selectExpr("id"))
    src = TableStreamSource(
        path=tbl, table_format="delta", max_files_per_trigger=2
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain(src.read_stream(spark), out, ckpt)
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    got = spark.read.schema("id long").parquet(out)
    assert got.count() == 80 == got.distinct().count()
    assert n_batches >= 4  # 8 snapshot files / 2 per trigger


# ------------------------------------------------------------------
# 2. default start = current snapshot, then tail
# ------------------------------------------------------------------


def test_default_start_serves_snapshot_despite_history(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id", "id as v"))
    log.merge_upsert(
        spark.createDataFrame([(3, 99), (42, 1)], "id long, v long"),
        ["id"],
    )
    log.delete_where(spark, __import__("pyspark").sql.functions.col("id") == 7)

    # the old default (replay from 0) raised on the MERGE commit;
    # the delta-spark default serves the live rows at stream start
    src = TableStreamSource(path=tbl, table_format="delta")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long, v long").parquet(out)
    batch = log.read(spark)
    assert sorted((r.id, r.v) for r in got.collect()) == sorted(
        (r.id, r.v) for r in batch.collect()
    )

    # and commits after the pinned snapshot are tailed exactly-once
    log.write(
        spark.createDataFrame([(100, 100)], "id long, v long")
    )
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long, v long").parquet(out)
    assert got.count() == got.distinct().count()
    assert got.filter("id = 100").count() == 1


def test_default_start_applies_mor_deletes(spark, tmp_path):
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 20).selectExpr("id", "id * 2 as v"))
    # merge-on-read delete: rows stay in the parts, killed by a
    # position-delete sidecar the initial-snapshot read must apply
    log.delete_where_mor(spark, F.col("id") % 4 == 0)
    src = TableStreamSource(path=tbl, table_format="delta")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long, v long").parquet(out)
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(20) if i % 4 != 0
    ]


def test_default_start_iceberg_snapshot_after_merge(spark, tmp_path):
    from aligned_spark.sources.iceberg_log import IcebergLog

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(
        spark.range(0, 12).selectExpr("id", "cast(id % 3 as int) as p"),
        partition_by=["p"],
    )
    log.merge_upsert(
        spark.createDataFrame([(5, 77)], "id long, p int"), keys=["id"]
    )
    src = TableStreamSource(path=tbl, table_format="iceberg")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long, p int").parquet(out)
    batch = log.read(spark)
    assert sorted((r.id, r.p) for r in got.collect()) == sorted(
        (r.id, r.p) for r in batch.collect()
    )


# ------------------------------------------------------------------
# 3. bloom sizing + fpp validation
# ------------------------------------------------------------------


def test_bloom_sidecar_sized_without_footer_stats(spark, tmp_path):
    from aligned_spark.sources import bloom as B

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(
        spark.range(0, 2000).selectExpr("id as k", "id * 2 as v")
    )
    log.set_bloom_filter(["k"])
    snap = log.snapshot()
    # simulate a stats-less add (e.g. a foreign writer): rebuild the
    # sidecars through attach_blooms with stats stripped
    adds = [dict(a) for a in snap.files.values()]
    for a in adds:
        a.pop("stats", None)
        a.pop("bloomFilters", None)
    B.attach_blooms(
        spark, tbl, adds, ["k"], log.read(spark).schema, 0
    )
    for a in adds:
        meta = a["bloomFilters"]["k"]
        # n=0 sizing produced the degenerate 64-bit bloom; group-size
        # fallback must size for the part's actual rows
        assert meta["numBits"] > 64
        # and the filter actually prunes an absent key
        import numpy as np

        row = (
            spark.range(1)
            .select(*B.hash_pair_lit("k", 10**12, "long"))
            .first()
        )
        pairs = np.array([[row[0], row[1]]], dtype=np.int64)
        assert not B.probe_hashes(tbl, a, "k", pairs)


def test_bloom_fpp_validation(spark, tmp_path):
    import json

    from aligned_spark.sources import bloom as B

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id as k"))
    for bad in (0.0, 1.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="fpp"):
            log.set_bloom_filter(["k"], fpp=bad)
    # a corrupt property read falls back to the default instead of
    # crashing every subsequent write
    cols, fpp = B.bloom_config_of(
        {
            "configuration": {
                B.BLOOM_PROP: json.dumps(
                    {"columns": ["k"], "fpp": 7.0}
                )
            }
        }
    )
    assert cols == ["k"] and fpp == B.DEFAULT_FPP


# ------------------------------------------------------------------
# 4. vacuum reaps orphaned .bloom.inprogress temp files
# ------------------------------------------------------------------


def test_vacuum_reaps_inprogress_bloom_temps(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id as k"))
    bloom_dir = os.path.join(tbl, "_bloom")
    os.makedirs(bloom_dir, exist_ok=True)
    stale = os.path.join(bloom_dir, "dead.k.bloom.inprogress")
    fresh = os.path.join(bloom_dir, "live.k.bloom.inprogress")
    for p in (stale, fresh):
        with open(p, "wb") as fh:
            fh.write(b"\0" * 8)
    old = time.time() - 8 * 24 * 3600
    os.utime(stale, (old, old))
    reaped = log.vacuum()
    assert "_bloom/dead.k.bloom.inprogress" in reaped
    assert not os.path.exists(stale)
    # inside the retention window: a concurrent build may still be
    # writing it
    assert os.path.exists(fresh)


# ------------------------------------------------------------------
# round-9 self-review fixes
# ------------------------------------------------------------------


def test_iceberg_stream_multi_tail_batches_exactly_once(
    spark, tmp_path
):
    """Default-start iceberg stream across MULTIPLE tail
    micro-batches: tailing must resume from the consumed watermark
    (start offset), never re-plan from the pinned snapshot — the
    review-verified replay bug delivered earlier appends twice."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id"))
    src = TableStreamSource(path=tbl, table_format="iceberg")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(src.read_stream(spark), out, ckpt)  # snapshot batch
    log.write(spark.range(10, 20).selectExpr("id"), mode="append")
    _drain(src.read_stream(spark), out, ckpt)  # tail batch 1
    log.write(spark.range(20, 30).selectExpr("id"), mode="append")
    _drain(src.read_stream(spark), out, ckpt)  # tail batch 2
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(30))
    assert got.count() == got.distinct().count()


def test_iceberg_cdf_stream_multi_tail_batches_exactly_once(
    spark, tmp_path
):
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.table_stream import register

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 10).selectExpr("id", "id as v"))
    register(spark)

    def stream():
        return (
            spark.readStream.format("aligned_table")
            .option("path", tbl)
            .option("format", "iceberg")
            .option("readChangeFeed", "true")
            .load()
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(stream(), out, ckpt)  # snapshot as inserts
    log.merge_upsert(
        spark.createDataFrame([(3, 99)], "id long, v long"),
        keys=["id"],
    )
    _drain(stream(), out, ckpt)  # tail batch 1 (update pair)
    log.write(
        spark.createDataFrame([(100, 1)], "id long, v long"),
        mode="append",
    )
    _drain(stream(), out, ckpt)  # tail batch 2 (insert)
    sch = stream().schema
    got = spark.read.schema(sch).parquet(out)
    # 10 snapshot inserts + update pre/post pair + 1 insert, no dups
    assert got.count() == 13
    assert (
        got.groupBy(
            "id", "v", "_change_type", "_snapshot_id"
        ).count().filter("count > 1").count()
        == 0
    )


def test_cdf_multiset_diff_nan_rows_match_spark_semantics(
    spark, tmp_path
):
    """Spark's exceptAll treats NaN = NaN; the stream's whole-row
    multiset diff must too — an unchanged NaN row is NOT a
    delete+insert pair (review-verified divergence)."""
    from aligned_spark.streaming.table_stream import register

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(
        spark.createDataFrame(
            [(1, float("nan")), (2, 2.0), (3, float("nan"))],
            "id long, v double",
        ).coalesce(1)
    )
    log.delete_where(
        spark,
        __import__("pyspark").sql.functions.col("id") == 2,
    )
    register(spark)
    sdf = (
        spark.readStream.format("aligned_table")
        .option("path", tbl)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
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
    got = spark.read.schema(sdf.schema).parquet(out)
    rows = [tuple(r) for r in got.collect()]
    # exactly ONE change: the deleted (2, 2.0) — the surviving NaN
    # rows must not round-trip as delete+insert noise
    assert len(rows) == 1 and rows[0][0] == 2
    batch = log.read_cdf(spark, 0)
    assert batch.count() == 1
