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
