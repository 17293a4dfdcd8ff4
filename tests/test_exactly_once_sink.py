"""Exactly-once streaming sink (`streaming/sinks.py` +
`sources/delta_log.py` txn actions): replayed micro-batches must not
duplicate rows."""

import datetime as dt

from pyspark.sql import Row


def _drop(spark, inbox, rows, schema="user_id long, ts timestamp, value double"):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)


def test_sink_replay_same_batch_id_is_noop(spark, tmp_path):
    """The at-least-once contract users hit first: foreachBatch
    invoked twice with the SAME batch_id (what Structured Streaming
    does after an unclean shutdown) must leave exactly one copy."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sinks import idempotent_delta_sink

    table = str(tmp_path / "tbl")
    sink = idempotent_delta_sink(table, app_id="s1")
    b0 = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    sink(b0, 0)
    sink(b0, 0)  # replay — must be skipped
    log = DeltaLog(table)
    assert log.read(spark).count() == 2
    assert log.txn_version("s1") == 0
    # a NEW batch appends
    sink(spark.createDataFrame([Row(k=3, v="c")]), 1)
    assert log.read(spark).count() == 3
    assert log.txn_version("s1") == 1
    # replay of an OLD batch after newer ones is also skipped
    sink(b0, 0)
    assert log.read(spark).count() == 3


def test_sink_upsert_mode_replay(spark, tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sinks import idempotent_delta_sink

    table = str(tmp_path / "tbl")
    sink = idempotent_delta_sink(table, keys=["k"], app_id="s1")
    sink(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]), 0)
    upd = spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")])
    sink(upd, 1)
    sink(upd, 1)  # replay
    got = {r.k: r.v for r in DeltaLog(table).read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_two_app_ids_do_not_mask_each_other(spark, tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sinks import idempotent_delta_sink

    table = str(tmp_path / "tbl")
    s1 = idempotent_delta_sink(table, app_id="s1")
    s2 = idempotent_delta_sink(table, app_id="s2")
    s1(spark.createDataFrame([Row(k=1)]), 0)
    s2(spark.createDataFrame([Row(k=2)]), 0)  # same batch_id, other app
    log = DeltaLog(table)
    assert log.read(spark).count() == 2
    assert log.txn_version("s1") == 0 and log.txn_version("s2") == 0


def test_stream_restart_with_forced_replay_no_duplicates(spark, tmp_path):
    """E2E: file-source stream → idempotent Delta sink, checkpointed.
    After run 1 we FORCE the replay Structured Streaming performs
    when a shutdown lands between sink completion and checkpoint
    acknowledgement — re-invoking the sink with run 1's last
    batch_id — then restart the stream over the same checkpoint with
    new files. The table must hold every input row exactly once."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sinks import idempotent_delta_sink
    from aligned_spark.streaming.sources import FileStreamSource

    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "tbl")
    schema = "user_id long, ts timestamp, value double"
    _drop(spark, inbox, [(1, dt.datetime(2024, 1, 1, 0, 0, 2), 2.0),
                         (2, dt.datetime(2024, 1, 1, 0, 0, 4), 3.0)])

    sink = idempotent_delta_sink(table, app_id="file_stream")
    seen: list[tuple[int, int]] = []  # (batch_id, row_count)

    def tracking_sink(df, batch_id):
        rows = df.count()
        sink(df, batch_id)
        seen.append((batch_id, rows))

    src = FileStreamSource(path=inbox, schema_ddl=schema)

    def run():
        q = (
            src.read_stream(spark)
            .writeStream.outputMode("append")
            .foreachBatch(tracking_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    log = DeltaLog(table)
    assert log.read(spark).count() == 2
    last_batch = max(b for b, _ in seen)

    # forced replay: shutdown happened "between sink and checkpoint"
    replayed = log.read(spark)  # same rows the batch carried
    sink(replayed, last_batch)
    assert log.read(spark).count() == 2, "replayed batch duplicated rows"

    # restart over the same checkpoint with new input
    _drop(spark, inbox, [(3, dt.datetime(2024, 1, 1, 0, 0, 6), 5.0)])
    run()
    out = log.read(spark)
    assert out.count() == 3
    assert sorted(r.user_id for r in out.collect()) == [1, 2, 3]
    # batch ids strictly advanced across the restart
    assert max(b for b, _ in seen) > last_batch


def test_stream_worker_defaults_to_exactly_once_delta_sink(
    spark, tmp_path
):
    """A view materialized into a (jar-free) DeltaSource gets the
    txn-guarded sink automatically: batches land once, the txn
    version advances, and a forced replay of the last batch is a
    no-op."""
    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
    )
    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.sources.in_memory import InMemorySource
    from aligned_spark.store import ContractStore
    from aligned_spark.streaming import StreamWorker
    from aligned_spark.streaming.sinks import idempotent_delta_sink
    from aligned_spark.streaming.sources import FileStreamSource

    inbox = str(tmp_path / "inbox")
    schema = "user_id long, ts timestamp, value double"
    _drop(spark, inbox, [(1, dt.datetime(2024, 1, 1, 0, 0, 2), 2.0),
                         (1, dt.datetime(2024, 1, 1, 0, 0, 4), 3.0),
                         (2, dt.datetime(2024, 1, 1, 0, 0, 6), 10.0)])
    delta_path = str(tmp_path / "delta_tbl")

    @feature_view(
        name="eo_stats",
        source=InMemorySource.from_dict(
            {"user_id": [], "ts": [], "value": []}, schema=schema
        ),
        stream_source=FileStreamSource(path=inbox, schema_ddl=schema),
        materialized_source=DeltaSource(path=delta_path),
    )
    class EoStats:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

        total = value.aggregate().sum().over(seconds=10)
        n = value.aggregate().count().over(seconds=10)

    store = ContractStore(spark)
    store.add_view(EoStats)
    worker = StreamWorker(
        store, "eo_stats",
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q = worker.start()  # no sink passed — default path under test
    q.awaitTermination(120)

    log = DeltaLog(delta_path)
    out = {r.user_id: (r.total, r.n) for r in log.read(spark).collect()}
    assert out[1] == (5.0, 2) and out[2] == (10.0, 1)
    last = log.txn_version("view:eo_stats")
    assert last is not None
    n_before = log.read(spark).count()
    # forced post-crash replay of the same batch: must be skipped
    replay = idempotent_delta_sink(
        delta_path, keys=["user_id", "ts"], app_id="view:eo_stats"
    )
    replay(log.read(spark), last)
    assert log.read(spark).count() == n_before
