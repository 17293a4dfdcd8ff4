"""Auto-compaction riding the write path (round-9: the
`maybe_optimize` policy finally has TRIGGERS).

- The exactly-once streaming sinks consult the metadata-only policy
  after every committed micro-batch: trickle small-file accumulation
  fires a bounded bin-pack of ONLY the small parts
  (`compact_small`), MOR sidecar churn fires the full OPTIMIZE.
- `IncrementalAggregate` refreshes compact their own target table.
- Compaction commits are dataChange=False / Iceberg ``replace``:
  invisible to the table stream, and replay safety is untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aligned_spark.sources.delta_log import DeltaLog
from aligned_spark.sources.iceberg_log import IcebergLog
from aligned_spark.streaming.sinks import (
    idempotent_delta_sink,
    idempotent_iceberg_sink,
)


def _trickle_files(spark, tmp_path, n_files: int) -> str:
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    for i in range(n_files):
        spark.createDataFrame(
            [(i, float(i))], "id long, v double"
        ).coalesce(1).write.mode("append").parquet(src)
    return src


def _trickle_stream(spark, src: str):
    return (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _trickle_source(spark, tmp_path, n_files: int):
    """A file-source stream producing one 1-row micro-batch per
    trigger — the trickle-ingest shape."""
    return _trickle_stream(
        spark, _trickle_files(spark, tmp_path, n_files)
    )


def _run(sdf, sink, ckpt: str):
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _optimize_commits(log: DeltaLog) -> list[dict]:
    return [
        h for h in log.history() if h.get("operation") == "OPTIMIZE"
    ]


def test_delta_sink_compacts_trickle_once_past_threshold(
    spark, tmp_path
):
    tbl, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = idempotent_delta_sink(
        tbl, compact_thresholds={"max_small_files": 4}
    )
    _run(_trickle_source(spark, tmp_path, 6), sink, ckpt)
    log = DeltaLog(tbl)
    opt = _optimize_commits(log)
    # 6 one-file commits at threshold 4: exactly ONE bin-pack (after
    # batch 4 -> 1 packed file; batches 5-6 leave 3 small, below
    # threshold)
    assert len(opt) == 1
    assert opt[0]["operationParameters"]["binPacked"] == "true"
    assert len(log.snapshot().files) == 3  # packed + 2 trickle parts
    got = log.read(spark)
    assert sorted(r.id for r in got.collect()) == list(range(6))
    assert got.count() == got.distinct().count()


def test_delta_sink_no_compaction_below_threshold(spark, tmp_path):
    tbl, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = idempotent_delta_sink(
        tbl, compact_thresholds={"max_small_files": 4}
    )
    _run(_trickle_source(spark, tmp_path, 3), sink, ckpt)
    log = DeltaLog(tbl)
    assert _optimize_commits(log) == []
    assert len(log.snapshot().files) == 3


def test_compaction_invisible_to_table_stream_and_replay_safe(
    spark, tmp_path
):
    from aligned_spark.streaming.sources import TableStreamSource

    tbl, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    sink = idempotent_delta_sink(
        tbl, compact_thresholds={"max_small_files": 4}
    )
    src_dir = _trickle_files(spark, tmp_path, 6)
    _run(_trickle_stream(spark, src_dir), sink, ckpt)
    log = DeltaLog(tbl)
    assert len(_optimize_commits(log)) == 1

    # every add/remove of the OPTIMIZE commit is dataChange=False —
    # the contract that makes it invisible to streams
    opt_version = max(
        h["version"]
        for h in log.history()
        if h.get("operation") == "OPTIMIZE"
    )
    for action in log._read_commit(opt_version):
        for kind in ("add", "remove"):
            if kind in action:
                assert action[kind]["dataChange"] is False

    # a full-history stream over the sink table replays every DATA
    # commit exactly once and never sees the compaction
    out2, ckpt2 = str(tmp_path / "o2"), str(tmp_path / "c2")
    src = TableStreamSource(
        path=tbl, table_format="delta", starting_version=0
    )
    q = (
        src.read_stream(spark)
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.read.schema("id long, v double").parquet(out2)
    assert sorted(r.id for r in got.collect()) == list(range(6))

    # replaying the drained ingest stream (fresh checkpoint, same
    # source files -> same batch ids) is a no-op: the txn guard
    # skips every batch and the policy doesn't re-fire
    _run(
        _trickle_stream(spark, src_dir),
        idempotent_delta_sink(
            tbl, compact_thresholds={"max_small_files": 4}
        ),
        str(tmp_path / "ckpt_replay"),
    )
    assert log.read(spark).count() == 6
    assert len(_optimize_commits(log)) == 1


def test_iceberg_sink_compacts_trickle(spark, tmp_path):
    tbl, ckpt = str(tmp_path / "i"), str(tmp_path / "ckpt")
    sink = idempotent_iceberg_sink(
        tbl, compact_thresholds={"max_small_files": 4}
    )
    _run(_trickle_source(spark, tmp_path, 6), sink, ckpt)
    log = IcebergLog(tbl)
    replaces = [
        s
        for s in log.current_metadata()["snapshots"]
        if s["summary"].get("operation") == "replace"
    ]
    assert len(replaces) == 1
    assert replaces[0]["summary"].get("bin-packed") == "true"
    view = log._resolve()
    assert len(view.files) == 3
    got = log.read(spark)
    assert sorted(r.id for r in got.collect()) == list(range(6))


def test_delta_mor_churn_takes_full_optimize(spark, tmp_path):
    # MOR sidecar churn fires the FULL optimize (drops sidecars,
    # restores the base protocol), not the bin-pack
    tbl, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    DeltaLog(tbl).write(
        spark.range(0, 100).selectExpr("id", "cast(id as double) as v")
    )
    sink = idempotent_delta_sink(
        tbl,
        keys=["id"],
        merge_on_read=True,
        compact_thresholds={"max_delete_files": 3},
    )
    src = str(tmp_path / "src")
    for i in range(4):
        spark.createDataFrame(
            [(i * 10, -1.0)], "id long, v double"
        ).coalesce(1).write.mode("append").parquet(src)
    sdf = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run(sdf, sink, ckpt)
    log = DeltaLog(tbl)
    # the threshold fired mid-stream (at 3 sidecars) and the full
    # OPTIMIZE dropped them; only the post-compaction batches' state
    # remains, below threshold
    assert len(log.snapshot().delete_files) < 3
    assert len(_optimize_commits(log)) >= 1
    got = log.read(spark)
    assert got.filter("v = -1.0").count() == 4
    assert got.count() == 100


def test_ivm_refresh_compacts_target(spark, tmp_path, monkeypatch):
    from pyspark.sql import Row

    from aligned_spark.operators.incremental import IncrementalAggregate
    from aligned_spark.sources.delta import DeltaSource

    monkeypatch.setattr(DeltaLog, "MAX_SMALL_FILES", 3)
    # disable size-targeted staging: this test NEEDS small files to
    # pile up so the IVM target's auto-compaction has work to do
    from aligned_spark.sources import parts as _parts

    monkeypatch.setattr(_parts, "TARGET_FILE_BYTES", 0)
    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            [Row(k=i, g=str(i % 3), x=float(i)) for i in range(9)]
        ).coalesce(1)
    )
    agg = IncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
    )
    agg.refresh(spark)
    for i in range(9, 14):
        src.insert(
            spark.createDataFrame(
                [Row(k=i, g=str(i % 3), x=float(i))]
            ).coalesce(1)
        )
        agg.refresh(spark)
    tlog = DeltaLog(str(tmp_path / "agg"))
    assert len(_optimize_commits(tlog)) >= 1
    direct = sorted(
        map(
            tuple,
            src.read(spark)
            .groupBy("g")
            .agg(F.count("*").alias("n_rows"), F.sum("x").alias("x"))
            .collect(),
        )
    )
    maintained = sorted(
        map(
            tuple,
            agg.read(spark).select("g", "n_rows", "x").collect(),
        )
    )
    assert maintained == direct
