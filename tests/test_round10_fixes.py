"""Round-10 regression tests for the r9 ADVICE findings.

1. (high) ``IncrementalAggregate.apply_changes`` silently dropped
   initial-snapshot CONTINUATION micro-batches: ``maxFilesPerTrigger``
   splits the default-start snapshot into slices that all carry the
   SAME ``_commit_version`` (the pinned snapshot version), so a
   version-keyed exactly-once cursor misread slices 2..m as
   checkpoint replays. Fixed by keying replay detection on the
   monotone ``foreachBatch`` batch id (recorded as its own txn,
   atomically with the merge).
2. (low) a checkpoint-replayed micro-batch with updates re-counted
   ``deleted_since_train`` churn in the vector-index maintenance
   meta — now idempotent per batch id.
3. (low) the distinct-aux transitions relied on ``persist()`` to pin
   aux PRE-state — now eagerly materialized via ``localCheckpoint``
   so a cache eviction after the aux commit can't recompute against
   POST-commit state.
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


def _direct_rows(src, spark):
    return sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(
                F.count("*").alias("n"),
                F.sum("x").alias("x"),
                F.min("x").alias("mn"),
                F.countDistinct("u").alias("du"),
            )
            .collect(),
        )
    )


def test_throttled_snapshot_bootstrap_continuous_ivm(spark, tmp_path):
    """maintain_continuously(max_files_per_trigger=1) over a 4-file
    snapshot must build the FULL aggregate (the r9 ADVICE repro built
    2 of 8 rows, one group entirely missing), including the distinct
    aux tables, and keep folding live changes after bootstrap."""
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    for i in range(4):
        src.insert(
            spark.createDataFrame(
                [
                    Row(k=2 * i, g="a", x=float(i), u=i % 2),
                    Row(k=2 * i + 1, g="b", x=float(10 + i), u=i),
                ]
            ).coalesce(1)
        )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        distincts=["u"],
    )
    ckpt = str(tmp_path / "ckpt")
    _drain(
        agg.maintain_continuously(
            spark, ckpt, max_files_per_trigger=1
        )
    )
    cols = ["g", "n_rows", "x", "min_x", "n_distinct_u"]
    assert _agg_rows(agg, spark, cols) == _direct_rows(src, spark)
    # every slice folded: both groups, all 8 rows
    total = (
        agg.read(spark).agg(F.sum("n_rows").alias("n")).first()["n"]
    )
    assert total == 8

    # live tail change folds on top of the throttled bootstrap
    src.upsert(
        spark.createDataFrame([Row(k=1, g="b", x=500.0, u=9)]),
        keys=["k"],
    )
    _drain(
        agg.maintain_continuously(
            spark, ckpt, max_files_per_trigger=1
        )
    )
    assert _agg_rows(agg, spark, cols) == _direct_rows(src, spark)

    # replay safety: draining the finished stream changes nothing
    before = _agg_rows(agg, spark, cols)
    _drain(
        agg.maintain_continuously(
            spark, ckpt, max_files_per_trigger=1
        )
    )
    assert _agg_rows(agg, spark, cols) == before


def test_apply_changes_batch_id_replay_guard(spark, tmp_path):
    """Direct apply_changes calls with a batch id: continuation
    slices at the SAME _commit_version fold (new batch id), true
    replays (same batch id) no-op."""
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            [Row(k=i, g=str(i % 2), x=float(i)) for i in range(4)]
        ).coalesce(1)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
    )
    v = src.version(spark)

    def slice_df(lo, hi):
        return (
            src.read(spark)
            .filter((F.col("k") >= lo) & (F.col("k") < hi))
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(v))
        )

    # two snapshot slices, SAME version, distinct batch ids
    assert agg.apply_changes(spark, slice_df(0, 2), batch_id=0) == v
    assert agg.apply_changes(spark, slice_df(2, 4), batch_id=1) == v
    got = sorted(
        map(tuple, agg.read(spark).select("g", "n_rows", "x").collect())
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
    assert got == direct
    # replaying either batch id is a no-op
    assert agg.apply_changes(spark, slice_df(2, 4), batch_id=1) is None
    assert agg.apply_changes(spark, slice_df(0, 2), batch_id=0) is None
    assert (
        sorted(
            map(
                tuple,
                agg.read(spark).select("g", "n_rows", "x").collect(),
            )
        )
        == direct
    )


def test_vector_index_churn_counter_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch id) containing updates must
    not re-count deleted_since_train (ADVICE r9: premature retrain
    trigger)."""
    import numpy as np

    from aligned_spark.sources.vector_index import (
        IvfIndexSource,
        _MaintenanceMeta,
    )

    rng = np.random.default_rng(7)
    rows = [
        Row(id=i, embedding=[float(x) for x in rng.normal(size=8)])
        for i in range(40)
    ]
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"),
        num_centroids=4,
        seed=3,
    )
    ivf.overwrite(spark.createDataFrame(rows))

    def update_batch():
        return spark.createDataFrame(
            [
                Row(
                    id=1,
                    embedding=[1.0] * 8,
                    _change_type="update_preimage",
                ),
                Row(
                    id=1,
                    embedding=[2.0] * 8,
                    _change_type="update_postimage",
                ),
            ]
        )

    ivf.apply_changes(
        update_batch(), auto_retrain=False, batch_id=5
    )
    meta = _MaintenanceMeta(ivf.path)
    churn = meta.load()["deleted_since_train"]
    assert churn == 1
    # checkpoint replay of the same micro-batch: index contents stay
    # correct, churn does NOT inflate
    ivf.apply_changes(
        update_batch(), auto_retrain=False, batch_id=5
    )
    assert meta.load()["deleted_since_train"] == churn
    got = (
        ivf.read_vectors(spark)
        if hasattr(ivf, "read_vectors")
        else ivf.read(spark)
    )
    assert got.filter(F.col(ivf.id_col) == 1).count() == 1
    # a NEW batch with a delete still counts
    ivf.apply_changes(
        spark.createDataFrame(
            [
                Row(
                    id=2,
                    embedding=[0.0] * 8,
                    _change_type="delete",
                )
            ]
        ),
        auto_retrain=False,
        batch_id=6,
    )
    assert meta.load()["deleted_since_train"] == churn + 1


def test_multi_txn_commit_atomicity(tmp_path, spark):
    """A commit carrying several writer-txn actions records every
    (appId, version) cursor atomically."""
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"))
    df = spark.createDataFrame([Row(a=1)])
    log.write(
        df, "append", txn=[("app", 7), ("app.batch", 3)]
    )
    assert log.txn_version("app") == 7
    assert log.txn_version("app.batch") == 3
    log.merge_upsert(
        spark.createDataFrame([Row(a=2)]),
        ["a"],
        txn=[("app", 8), ("app.batch", 4)],
    )
    assert log.txn_version("app") == 8
    assert log.txn_version("app.batch") == 4


# ------------------------------------------------------------------
# r9 VERDICT tasks 2 & 6: iceberg stream admission control + delta
# oversized-append-commit splitting
# ------------------------------------------------------------------


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


def test_iceberg_max_files_per_trigger_initial_snapshot(
    spark, tmp_path
):
    """The r9 gap: the iceberg reader served the ENTIRE initial
    snapshot as one slice regardless of maxFilesPerTrigger."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(spark.range(0, 80).repartition(8).selectExpr("id"))
    src = TableStreamSource(
        path=tbl, table_format="iceberg", max_files_per_trigger=2
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain_q(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long").parquet(out)
    assert got.count() == 80 == got.distinct().count()
    assert _n_batches(q) >= 4  # 8 snapshot files / 2 per trigger


def test_iceberg_max_files_per_trigger_fresh_backlog(spark, tmp_path):
    """Tail admission: a 4-snapshot backlog with 1 file each drains
    one snapshot per trigger under maxFilesPerTrigger=1."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    for lo in (0, 10, 20, 30):
        log.write(
            spark.range(lo, lo + 10).coalesce(1).selectExpr("id")
        )
    first = log.snapshot_ids()[0]
    src = TableStreamSource(
        path=tbl,
        table_format="iceberg",
        starting_snapshot_id=first,
        max_files_per_trigger=1,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain_q(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(40))
    assert _n_batches(q) >= 4


def test_iceberg_cdf_throttled_snapshot_then_tail(spark, tmp_path):
    """readChangeFeed + maxFilesPerTrigger on iceberg: the initial
    snapshot arrives as several insert micro-batches, a MERGE tail
    still lands exactly-once."""
    from aligned_spark.sources.iceberg_log import IcebergLog
    from aligned_spark.streaming.table_stream import register
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "i")
    log = IcebergLog(tbl)
    log.write(
        spark.range(0, 40)
        .repartition(4)
        .selectExpr("id", "id as v")
    )
    src = TableStreamSource(
        path=tbl,
        table_format="iceberg",
        read_change_feed=True,
        max_files_per_trigger=1,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain_q(src.read_stream(spark), out, ckpt)
    assert _n_batches(q) >= 4  # 4 snapshot files / 1 per trigger
    log.merge_upsert(
        spark.createDataFrame([(3, 99)], "id long, v long"),
        keys=["id"],
    )
    _drain_q(src.read_stream(spark), out, ckpt)
    sch = src.read_stream(spark).schema
    got = spark.read.schema(sch).parquet(out)
    # 40 snapshot inserts + one update pre/post pair, no dups
    assert got.count() == 42
    assert (
        got.groupBy("id", "v", "_change_type", "_snapshot_id")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    assert (
        got.filter("_change_type = 'update_postimage'").first()["v"]
        == 99
    )


def test_delta_oversized_append_commit_splits(spark, tmp_path):
    """r9 VERDICT task 6: a 100-file append commit with
    maxFilesPerTrigger=10 drains in ~10 micro-batches instead of
    one."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(spark.range(0, 10).coalesce(1).selectExpr("id"))
    # ONE commit with 100 files (range partitioning: none empty)
    log.write(
        spark.range(10, 110)
        .repartitionByRange(100, "id")
        .selectExpr("id")
    )
    src = TableStreamSource(
        path=tbl,
        table_format="delta",
        starting_version=0,
        max_files_per_trigger=10,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _drain_q(src.read_stream(spark), out, ckpt)
    got = spark.read.schema("id long").parquet(out)
    assert sorted(r.id for r in got.collect()) == list(range(110))
    # 1 small commit + 100-file commit / 10 per trigger ≈ 11
    assert _n_batches(q) >= 10


def test_delta_cdf_oversized_append_splits_rewrite_whole(
    spark, tmp_path
):
    """CDF stream: an oversized append commit splits by file index;
    a rewrite commit (one diff unit) is admitted whole — and a
    restart replays the split exactly-once."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sources import TableStreamSource

    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(
        spark.range(0, 4).coalesce(1).selectExpr("id", "id as v")
    )
    src = TableStreamSource(
        path=tbl,
        table_format="delta",
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
        ["id"],
    )
    q = _drain_q(src.read_stream(spark), out, ckpt)
    assert _n_batches(q) >= 3  # 6-file append / 2 + rewrite batch
    sch = src.read_stream(spark).schema
    got = spark.read.schema(sch).parquet(out)
    # 4 snapshot + 6 appended inserts + update pre/post pair
    assert got.count() == 12
    assert (
        got.groupBy("id", "v", "_change_type", "_commit_version")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    ins = got.filter("_change_type = 'insert'")
    assert sorted(r.id for r in ins.collect()) == list(range(10))


def test_pca_fit_power_matches_eigh_on_separated_spectrum(spark):
    """r9 VERDICT task 7 support: the fixed-schedule power fit (the
    oracle-replayable one) converges to the eigh fit when the
    spectrum has real gaps — same components (to 1e-6), same
    projections."""
    import numpy as np

    from aligned_spark.operators.decompose import (
        pca_fit,
        pca_fit_power,
        pca_project,
    )

    rng = np.random.default_rng(11)
    d, n = 16, 400
    # strong planted spectrum: variances 100, 25, 9, 1, ...
    scales = np.array([10.0, 5.0, 3.0] + [0.5] * (d - 3))
    x = rng.normal(size=(n, d)) * scales
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, embedding array<double>",
    ).coalesce(2)
    m_eigh = pca_fit(df, "embedding", dim=d, k=3)
    m_pow = pca_fit_power(df, "embedding", dim=d, k=3, iters=60)
    for a, b in zip(m_eigh.components, m_pow.components):
        assert float(np.abs(a - b).max()) < 1e-6
    pe = {
        r.id: r.pca
        for r in pca_project(df, m_eigh, "embedding").collect()
    }
    pp = {
        r.id: r.pca
        for r in pca_project(df, m_pow, "embedding").collect()
    }
    for i in pe:
        assert np.allclose(pe[i], pp[i], atol=1e-5)


# ------------------------------------------------------------------
# r9 VERDICT task 5: sidecar-map ceiling (footer-stats range mode)
# ------------------------------------------------------------------


def _mor_table_with_sidecars(spark, tmp_path, n_deletes=5):
    from aligned_spark.sources.delta_log import DeltaLog

    tbl = str(tmp_path / "mor")
    log = DeltaLog(tbl)
    log.write(
        spark.range(0, 100)
        .repartitionByRange(10, "id")
        .selectExpr("id", "id as v")
    )
    for i in range(n_deletes):
        log.delete_where_mor(spark, F.col("id") % 17 == i)
    return tbl, log


def test_sidecar_footer_map_superset_of_exact(spark, tmp_path):
    from aligned_spark.streaming.table_stream import (
        _SidecarRangeMap,
        _sidecar_map,
    )

    tbl, log = _mor_table_with_sidecars(spark, tmp_path)
    snap = log.snapshot()
    assert snap.delete_files
    exact = _sidecar_map(tbl, snap.delete_files, footer_threshold=10**9)
    ranged = _sidecar_map(tbl, snap.delete_files, footer_threshold=0)
    assert isinstance(ranged, _SidecarRangeMap)
    for rel in snap.files:
        assert set(exact.get(rel, ())) <= set(ranged.get(rel, ()))


def test_stream_snapshot_correct_in_footer_map_mode(
    spark, tmp_path, monkeypatch
):
    """Default-start stream over a MOR table with the footer-map
    ceiling forced on: identical rows to the batch read (the range
    map is a sound superset; executors drop non-matching pairs)."""
    import os

    from aligned_spark.streaming.sources import TableStreamSource

    monkeypatch.setenv("ALIGNED_SIDECAR_FOOTER_THRESHOLD", "0")
    tbl, log = _mor_table_with_sidecars(spark, tmp_path)
    src = TableStreamSource(path=tbl, table_format="delta")
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
    got = spark.read.schema("id long, v long").parquet(out)
    direct = log.read(spark)
    assert sorted((r.id, r.v) for r in got.collect()) == sorted(
        (r.id, r.v) for r in direct.collect()
    )


def test_refresh_built_aggregate_skips_stream_bootstrap(
    spark, tmp_path
):
    """Mixing guard (r10 self-review): an aggregate first built by
    refresh(), then attached to a default-start change stream, must
    NOT re-fold the snapshot-as-inserts bootstrap (vmax == cursor
    with no batch txn = already-applied state, not a continuation
    slice)."""
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
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
    agg.refresh(spark)  # poll-built at the current version
    ckpt = str(tmp_path / "ckpt")
    _drain(agg.maintain_continuously(spark, ckpt))
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("x").alias("x"))
            .collect(),
        )
    )
    # and live tail changes still fold through the stream
    src.upsert(
        spark.createDataFrame([Row(k=1, g="1", x=100.0)]),
        keys=["k"],
    )
    _drain(agg.maintain_continuously(spark, ckpt))
    assert _agg_rows(agg, spark, ["g", "n_rows", "x"]) == sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("x").alias("x"))
            .collect(),
        )
    )


def test_stale_slice_below_cursor_skipped(spark, tmp_path):
    """vmax < cursor in batch mode = a poll refresh ran ahead of the
    stream; folding would double-apply the commits."""
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
    agg.refresh(spark)
    src.insert(
        spark.createDataFrame([Row(k=9, g="a", x=5.0)]).coalesce(1)
    )
    agg.refresh(spark)  # cursor now at version 1
    stale = (
        src.read(spark)
        .filter(F.col("k") < 4)
        .withColumn("_change_type", F.lit("insert"))
        .withColumn("_commit_version", F.lit(0))
    )
    assert agg.apply_changes(spark, stale, batch_id=0) is None
    got = agg.read(spark).select("n_rows", "x").first()
    assert (got["n_rows"], got["x"]) == (5, 9.0)
