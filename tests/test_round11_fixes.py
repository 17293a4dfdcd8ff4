"""Round-11 regression tests: the r10 VERDICT "next round" tasks and
the r10 ADVICE bugs.

- ADVICE medium (cdf_stream.py `_commit_splittable`): a RESTORE-style
  commit (re-adds + a dropped sidecar whose data file is still live,
  no removes) must NOT be split across triggers — partitions() plans
  it as one diff unit, so a cidx resume would re-emit adds[cidx:] as
  duplicate inserts.
- ADVICE low (incremental.py): a poll refresh() that advanced the
  cursor over a pure-append commit which the stream then redelivers
  is now distinguishable from an initial-snapshot continuation slice
  via the stream's own last-planned-version txn.
- ADVICE low (table_stream.py / vector_index.py): versioned stream
  offsets fail fast on ambiguous pre-r10 checkpoints; corrupt (not
  missing) maintenance metadata raises instead of silently zeroing
  the churn counter.
- VERDICT task 1: the change-file materialization gate is
  files >= thr AND bytes >= thr  OR  bytes >= large-bytes bound — a
  rewrite touching few-but-huge parts streams through change files,
  never a one-task read-time diff.
- VERDICT task 3: Iceberg tail snapshots split across triggers by
  sorted ADDED-file index (the delta `cidx` mechanism), with a
  versioned offset format.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _drain(q) -> None:
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _agg_rows(agg, spark, cols):
    return sorted(
        map(tuple, agg.read(spark).select(*cols).collect())
    )


def test_refresh_covered_append_not_double_applied(spark, tmp_path):
    """ADVICE low (incremental.py:295): the stream bootstraps the
    aggregate, a poll refresh() then advances the cursor over a NEW
    pure-append commit, and the stream redelivers that commit as an
    insert-only slice with vmax == cursor. Before r11 this was
    indistinguishable from an initial-snapshot continuation slice
    (insert-only, batch txn present) and double-applied; the
    stream's own last-planned-version txn now tells them apart."""
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            [Row(k=i, g="a", x=1.0) for i in range(4)]
        ).coalesce(1)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
    )
    ckpt = str(tmp_path / "ckpt")
    # stream bootstrap: snapshot-as-inserts at version 0
    _drain(agg.maintain_continuously(spark, ckpt))
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == [
        ("a", 4, 4.0)
    ]
    # a pure-append commit lands and a POLL refresh absorbs it
    src.insert(
        spark.createDataFrame([Row(k=9, g="a", x=5.0)]).coalesce(1)
    )
    agg.refresh(spark)  # cursor -> 1, stream never planned v1
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == [
        ("a", 5, 9.0)
    ]
    # the stream now redelivers commit 1: insert-only, vmax == cursor
    redelivered = (
        spark.createDataFrame([Row(k=9, g="a", x=5.0)])
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(1))
    )
    assert agg.apply_changes(spark, redelivered, batch_id=7) is None
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == [
        ("a", 5, 9.0)
    ]


def test_snapshot_continuation_still_folds(spark, tmp_path):
    """The stream-txn disambiguator must not break the legitimate
    vmax == cursor case: a throttled default-start stream's
    continuation slices (same pinned snapshot version, later batch
    ids) keep folding."""
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            [Row(k=i, g=str(i % 2), x=float(i)) for i in range(12)]
        ).repartition(6)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
    )
    ckpt = str(tmp_path / "ckpt")
    # maxFilesPerTrigger=2 slices the 6-file snapshot into 3
    # insert-only micro-batches that all carry _commit_version 0
    _drain(
        agg.maintain_continuously(
            spark, ckpt, max_files_per_trigger=2
        )
    )
    direct = sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("x").alias("x"))
            .collect(),
        )
    )
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == direct

def test_restore_commit_with_live_sidecar_drop_not_split(
    spark, tmp_path
):
    """ADVICE medium (cdf_stream.py:393): a RESTORE-style commit —
    many re-adds plus a dropped sidecar whose data file is STILL
    LIVE, no removes — is planned as one diff unit by partitions(),
    so latestOffset must not hand it a {version, cidx} split offset
    (the cidx resume would re-emit adds[cidx:] as duplicate
    inserts). Before r11 _commit_splittable only looked at removes
    and NEW sidecars, so exactly this commit split."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    # v0: 8 single-file partitions (partition-aligned so the CoW
    # delete below removes WHOLE files — a straddling file would
    # rewrite and give the restore commit a remove action, dodging
    # the bug under test)
    log.write(
        spark.range(0, 80)
        .selectExpr("id", "id as v", "id div 10 as b")
        .repartition(8, "b"),
        partition_by=["b"],
    )
    src = TableStreamSource(
        path=tbl,
        table_format="delta",
        read_change_feed=True,
        max_files_per_trigger=2,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # v1: CoW delete drops 6 whole parts; v2: MOR delete leaves a
    # sidecar on a SURVIVING part; v3: RESTORE to v0 = 6 re-adds +
    # deleteFile add=false of that sidecar (its data file is live
    # in the restored state), zero removes — splittable by the old
    # file-count predicate, but planned as ONE diff unit
    log.delete_where(spark, F.col("b") >= 2)
    log.delete_where_mor(spark, F.col("id") == 3)
    log.restore(0)
    acts = log._read_commit(3)
    assert not any("remove" in a for a in acts)  # shape guard
    assert sum("add" in a for a in acts) == 6
    assert any(
        "deleteFile" in a and not a["deleteFile"].get("add", True)
        for a in acts
    )
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    sch = src.read_stream(spark).schema
    got = spark.read.schema(sch).parquet(out)
    # exactly-once: no (row, change, version) appears twice
    assert (
        got.groupBy("id", "v", "_change_type", "_commit_version")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    # and the stream equals the batch CDC feed from the start
    batch = log.read_cdf(spark, 0)
    assert sorted(
        (r.id, r.v, r._change_type, r._commit_version)
        for r in got.filter("_commit_version > 0").collect()
    ) == sorted(
        (r.id, r.v, r._change_type, r._commit_version)
        for r in batch.filter("_commit_version > 0").collect()
    )

def test_corrupt_maintenance_meta_raises_missing_defaults(tmp_path):
    """ADVICE low (vector_index.py:108): a MISSING maintenance file
    means a fresh index (defaults); a CORRUPT one must raise instead
    of silently zeroing the churn counter and dropping the
    last_folded_batch replay cursor."""
    from aligned_spark.sources.vector_index import _MaintenanceMeta

    meta = _MaintenanceMeta(str(tmp_path / "idx"))
    # missing -> defaults
    assert meta.load() == {"deleted_since_train": 0}
    assert meta.last_folded_batch() is None
    meta.add_deleted(3)
    meta.mark_batch(5)
    assert meta.load()["deleted_since_train"] == 3
    assert meta.last_folded_batch() == 5
    # corrupt -> ValueError, state preserved on disk
    with open(meta._file, "w") as fh:
        fh.write("{not json")
    with pytest.raises(ValueError, match="unreadable"):
        meta.load()
    with pytest.raises(ValueError):
        meta.last_folded_batch()

def _drain_q(sdf, out: str, ckpt: str):
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


def _n_batches(q) -> int:
    return len([p for p in q.recentProgress if p["numInputRows"] > 0])


def test_iceberg_oversized_append_snapshot_splits(spark, tmp_path):
    """VERDICT task 3: a 100-file Iceberg append snapshot with
    maxFilesPerTrigger=10 drains in ~10 micro-batches (the delta
    cidx mechanism, ported) instead of one."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 10).coalesce(1).selectExpr("id"))
    src = TableStreamSource(
        path=tbl,
        table_format="iceberg",
        starting_snapshot_id="latest",
        max_files_per_trigger=10,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain_q(src.read_stream(spark), out, ckpt)
    # ONE snapshot with 100 files (range partitioning: none empty)
    log.write(
        spark.range(10, 110)
        .repartitionByRange(100, "id")
        .selectExpr("id")
    )
    q = _drain_q(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(10, 110))
    assert _n_batches(q) >= 10  # 100 files / 10 per trigger
    # exactly-once across the split offsets
    assert got.distinct().count() == 100


def test_iceberg_cdf_oversized_append_splits_rewrite_whole(
    spark, tmp_path
):
    """Iceberg CDF stream twin: an oversized append snapshot splits
    by sorted-file index; a rewrite snapshot (one diff unit) is
    admitted whole — and the result equals the batch CDC feed."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(
        spark.range(0, 4).coalesce(1).selectExpr("id", "id as v")
    )
    src = TableStreamSource(
        path=tbl,
        table_format="iceberg",
        read_change_feed=True,
        max_files_per_trigger=2,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain_q(src.read_stream(spark), out, ckpt)  # snapshot batch
    # oversized append (6 files) + keyed rewrite in the backlog
    log.write(
        spark.range(4, 10).repartition(6).selectExpr("id", "id as v")
    )
    log.merge_upsert(
        spark.createDataFrame([(0, 77)], "id long, v long"),
        keys=["id"],
    )
    q = _drain_q(src.read_stream(spark), out, ckpt)
    assert _n_batches(q) >= 3  # 6-file append / 2 + rewrite batch
    sch = src.read_stream(spark).schema
    got = spark.read.schema(sch).parquet(out)
    # 4 snapshot + 6 appended inserts + update pre/post pair
    assert got.count() == 12
    assert (
        got.groupBy("id", "v", "_change_type", "_snapshot_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    ins = got.filter("_change_type = 'insert'")
    assert sorted(r.id for r in ins.collect()) == list(range(10))


def test_unversioned_ambiguous_iceberg_offset_raises(
    spark, tmp_path
):
    """ADVICE low (table_stream.py:549): a pre-r10 checkpoint offset
    (no fmt marker, idx >= 1 meaning 'whole snapshot planned') must
    fail fast instead of silently re-serving files under the new
    idx-counts-files meaning. Unambiguous unversioned offsets (no
    idx, or idx == 0) stay accepted."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.table_stream import (
        _IcebergStreamReader,
    )

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 20).repartition(4).selectExpr("id"))
    sid = log.snapshot_ids()[-1]
    rdr = _IcebergStreamReader(
        spark.range(1).schema, {"path": tbl}
    )
    ambiguous = {"snapshot_id": sid, "snap_v": sid, "idx": 1}
    with pytest.raises(ValueError, match="unversioned"):
        rdr.partitions(ambiguous, {"snapshot_id": sid, "fmt": 2})
    with pytest.raises(ValueError, match="unversioned"):
        rdr._check_offset({"snapshot_id": sid, "cidx": 2})
    # unambiguous unversioned shapes still work
    rdr._check_offset({"snapshot_id": sid})
    rdr._check_offset({"snapshot_id": sid, "snap_v": sid, "idx": 0})
    # and every emitted offset is versioned
    assert rdr.initialOffset()["fmt"] == 2
    assert rdr.latestOffset()["fmt"] == 2


def _run_once(spark, src, out: str, ckpt: str) -> None:
    """One trigger-once micro-batch against a shared checkpoint —
    every call is a FRESH query instance, so each batch boundary is
    also a restart boundary (offset resume from the checkpoint)."""
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()


def test_iceberg_mid_split_checkpoint_restart_exactly_once(
    spark, tmp_path
):
    """The subtlest r11 state machine: a {snapshot_id, cidx} offset
    persisted MID-split must resume exactly where it stopped on a
    fresh query instance. Drive the whole backlog with trigger-once
    runs (restart at EVERY batch boundary) and pin exactly-once."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 1).coalesce(1).selectExpr("id"))
    src = TableStreamSource(
        path=tbl,
        table_format="iceberg",
        starting_snapshot_id="latest",
        max_files_per_trigger=2,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_once(spark, src, out, ckpt)  # latest-start: tail only
    # ONE oversized snapshot: 9 files, 2 per trigger -> 5 splits
    log.write(
        spark.range(1, 10)
        .repartitionByRange(9, "id")
        .selectExpr("id")
    )
    _run_once(spark, src, out, ckpt)
    assert (
        spark.read.schema("id long").parquet(out).count() == 2
    ), "trigger-once must serve ONE split window, else no restart"
    for _ in range(6):  # a couple of no-op tails are fine
        _run_once(spark, src, out, ckpt)
        got = spark.read.schema("id long").parquet(out)
        assert got.count() == got.distinct().count(), (
            "duplicate rows after a mid-split restart"
        )
    got = spark.read.schema("id long").parquet(out)
    # latest-start serves only the appended snapshot's rows
    assert sorted(r.id for r in got.collect()) == list(range(1, 10))


def test_delta_mid_split_checkpoint_restart_exactly_once(
    spark, tmp_path
):
    """Delta {version, cidx} twin of the mid-split restart pin."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "d")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 1).coalesce(1).selectExpr("id"))
    src = TableStreamSource(
        path=tbl,
        table_format="delta",
        starting_version="latest",
        max_files_per_trigger=2,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_once(spark, src, out, ckpt)
    log.write(
        spark.range(1, 10)
        .repartitionByRange(9, "id")
        .selectExpr("id"),
        "append",
    )
    _run_once(spark, src, out, ckpt)
    assert (
        spark.read.schema("id long").parquet(out).count() == 2
    ), "trigger-once must serve ONE split window, else no restart"
    for _ in range(6):
        _run_once(spark, src, out, ckpt)
        got = spark.read.schema("id long").parquet(out)
        assert got.count() == got.distinct().count(), (
            "duplicate rows after a mid-split restart"
        )
    got = spark.read.schema("id long").parquet(out)
    # latest-start serves only the appended commit's rows
    assert sorted(r.id for r in got.collect()) == list(range(1, 10))
