"""Delta merge-on-read position deletes (`delta_log.py`): small
deletes/upserts write (file_path, pos) sidecars under
`_position_deletes/` instead of rewriting parts; the commit raises
the protocol to reader/writer table features (protocol-lawful
gating) and OPTIMIZE restores it; CDC reconstructs the same feed as
copy-on-write."""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture()
def log(tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog

    return DeltaLog(str(tmp_path / "tbl"))


def _mk(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])


def test_mor_delete_writes_no_data_parts(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(100)]).coalesce(1),
        "append",
    )
    before = set(log.snapshot().files)
    log.delete_where_mor(spark, F.col("k") < 10)
    snap = log.snapshot()
    assert set(snap.files) == before  # zero data parts rewritten
    assert snap.delete_files
    assert all(
        p.startswith("_position_deletes/") for p in snap.delete_files
    )
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == list(range(10, 100))
    # protocol now gates foreign readers on the feature
    proto = [
        a["protocol"]
        for a in log._read_commit(log.latest_version())
        if "protocol" in a
    ]
    assert proto and proto[0]["readerFeatures"] == [
        "aligned.positionDeletes"
    ]
    # no-op predicates commit nothing
    v = log.latest_version()
    log.delete_where_mor(spark, F.lit(None).cast("boolean"))
    assert log.latest_version() == v


def test_mor_merge_appends_and_masks(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(50)]).coalesce(1),
        "append",
    )
    before = set(log.snapshot().files)
    log.merge_upsert_mor(_mk(spark, [(7, "UPD"), (999, "NEW")]), ["k"])
    snap = log.snapshot()
    assert before <= set(snap.files)  # old parts intact, one added
    assert len(snap.delete_files) == 1
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[7] == "UPD" and got[999] == "NEW" and len(got) == 51
    log.merge_upsert_mor(_mk(spark, [(7, "UPD2")]), ["k"])
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[7] == "UPD2" and len(got) == 51


def test_mor_cdf_matches_cow_semantics(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(100)]).coalesce(1),
        "append",
    )
    v0 = log.latest_version()
    log.merge_upsert_mor(_mk(spark, [(5, "UPD"), (500, "NEW")]), ["k"])
    log.delete_where_mor(spark, F.col("k") == 6)
    got = {
        (r.k, r._change_type): r.v
        for r in log.read_cdf(spark, v0).collect()
    }
    assert got == {
        (5, "update_preimage"): "v5",
        (5, "update_postimage"): "UPD",
        (500, "insert"): "NEW",
        (6, "delete"): "v6",
    }
    # a MOR-deleted row must NOT re-emit from a later delete slice
    v1 = log.latest_version()
    log.delete_where_mor(spark, F.col("k") < 8)
    dead = {r.k for r in log.read_cdf(spark, v1).collect()}
    assert dead == {0, 1, 2, 3, 4, 5, 7}


def test_mor_cow_interplay_no_resurrection(spark, log):
    log.write(
        _mk(spark, [(i, "x") for i in range(20)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") == 3)
    log.merge_upsert(_mk(spark, [(4, "UPD")]), ["k"])  # CoW rewrite
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(20) if i != 3]
    log.delete_where(spark, F.col("k") == 5)  # CoW delete
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(20) if i not in (3, 5)]


def test_optimize_purges_sidecars_and_restores_protocol(spark, log):
    log.write(
        _mk(spark, [(i, "x") for i in range(40)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") % 4 == 0)
    assert log.snapshot().delete_files
    log.optimize(spark)
    snap = log.snapshot()
    assert not snap.delete_files
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(40) if i % 4 != 0]
    proto = [
        a["protocol"]
        for a in log._read_commit(log.latest_version())
        if "protocol" in a
    ]
    assert proto and "readerFeatures" not in proto[0]
    # vacuum with zero retention now reclaims the orphaned sidecar
    doomed = log.vacuum(retention_seconds=0)
    assert any(p.startswith("_position_deletes/") for p in doomed)
    assert sorted(r.k for r in log.read(spark).collect()) == got


def test_mor_survives_checkpoint_replay(spark, tmp_path):
    """delete_files must round-trip through the parquet checkpoint —
    a reader starting from the checkpoint must still apply them."""
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"), checkpoint_interval=2)
    log.write(
        _mk(spark, [(i, "x") for i in range(30)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") < 5)
    log.write(_mk(spark, [(100, "y")]), "append")  # v2 → checkpoint
    assert log._last_checkpoint() == 2
    # remove pre-checkpoint commits: replay must come from the
    # checkpoint alone
    import os

    for v in (0, 1):
        os.unlink(os.path.join(log.log_dir, f"{v:020d}.json"))
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == list(range(5, 30)) + [100]


def test_source_merge_on_read_routing(spark, tmp_path):
    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog

    src = DeltaSource(path=str(tmp_path / "t"), merge_on_read=True)
    src.insert(_mk(spark, [(i, "x") for i in range(10)]).coalesce(1))
    before = set(DeltaLog(src.path).snapshot().files)
    src.upsert(_mk(spark, [(1, "U")]), keys=["k"])
    src.delete_where(spark, F.col("k") == 2)
    snap = DeltaLog(src.path).snapshot()
    assert before <= set(snap.files)
    assert len(snap.delete_files) == 2
    got = {r.k: r.v for r in src.read(spark).collect()}
    assert got[1] == "U" and 2 not in got and len(got) == 9


def test_mor_streaming_sink_replay_guard(spark, tmp_path):
    """Exactly-once MOR upsert sink: replayed batches skip, the
    cursor rides the MOR commit atomically, parts never rewrite."""
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.streaming.sinks import idempotent_delta_sink

    path = str(tmp_path / "t")
    # auto_compact off: this test pins that the MOR MERGE itself
    # never rewrites parts — the (round-9, default-on) post-commit
    # compaction legitimately would once sidecar churn crosses the
    # policy (covered by tests/test_auto_compact.py)
    sink = idempotent_delta_sink(
        path,
        keys=["k"],
        app_id="s",
        merge_on_read=True,
        auto_compact=False,
    )
    sink(_mk(spark, [(1, "a"), (2, "b")]), 0)
    files0 = set(DeltaLog(path).snapshot().files)
    sink(_mk(spark, [(2, "B"), (3, "c")]), 1)
    sink(_mk(spark, [(2, "WRONG")]), 1)  # forced replay — skipped
    log = DeltaLog(path)
    assert log.txn_version("s") == 1
    assert files0 <= set(log.snapshot().files)  # appends only
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_store_materializes_into_mor_delta(spark, tmp_path):
    """Store wiring: a view materialized into a merge-on-read
    DeltaSource refreshes incrementally via MOR merges and feeds
    changes_since with true row-level slices."""
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
    mat = DeltaSource(
        path=str(tmp_path / "mat"), merge_on_read=True
    )
    schema = "user_id long, ts timestamp, value double"
    t = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [(i, t, float(i)) for i in range(1, 101)], schema
    ).coalesce(1).write.parquet(base.path)

    @feature_view(name="mor_mat", source=base, materialized_source=mat)
    class MorMat:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

    store = ContractStore(spark)
    store.add_view(MorMat)
    store.materialize("mor_mat")
    cursor = store.materialized_version("mor_mat")
    spark.createDataFrame(
        [(999, dt.datetime(2024, 1, 6), 5.0)], schema
    ).write.mode("append").parquet(base.path)
    store.materialize_incremental("mor_mat")
    ch = store.changes_since("mor_mat", cursor)
    counts = {
        r["_change_type"]: r["count"]
        for r in ch.groupBy("_change_type").count().collect()
    }
    assert counts == {"insert": 1}


def test_mor_with_special_char_partition_values(spark, tmp_path):
    """Same encoding trap on the Delta side: partitioned-by values
    with spaces/'+' must round-trip the rel-path derivation."""
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, p="NOT SPECIFIED" if i % 2 else "a+b", v=i)
         for i in range(20)]
    )
    log.write(df.coalesce(1), "append", partition_by=["p"])
    log.delete_where_mor(spark, F.col("k") < 4)
    assert log.read(spark).count() == 16
    log.merge_upsert(
        spark.createDataFrame([Row(k=5, p="NOT SPECIFIED", v=99)]),
        ["k"],
    )
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[5] == 99 and len(got) == 16


def test_cow_rewrite_prunes_fully_stale_sidecars(spark, log):
    """A CoW rewrite that removes every file a sidecar references
    drops the sidecar in the same commit and restores the base
    protocol — the table doesn't stay feature-gated forever."""
    log.write(
        _mk(spark, [(i, "x") for i in range(20)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") == 3)
    assert log.snapshot().delete_files
    # CoW delete touches (and removes) the only data file
    log.delete_where(spark, F.col("k") == 7)
    snap = log.snapshot()
    assert not snap.delete_files  # stale sidecar dropped
    proto = [
        a["protocol"]
        for a in log._read_commit(log.latest_version())
        if "protocol" in a
    ]
    assert proto and "readerFeatures" not in proto[0]
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(20) if i not in (3, 7)]
    # vacuum can now reclaim the orphaned sidecar bytes
    doomed = log.vacuum(retention_seconds=0)
    assert any(p.startswith("_position_deletes/") for p in doomed)


def test_mor_table_path_containing_data_segment(spark, tmp_path):
    """A TABLE rooted under a path containing '/data/' (or spaces)
    must not corrupt the rel-path derivation — segment counting, not
    prefix/anchor matching (code-review finding, round 7)."""
    import os

    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.sources.iceberg_log import IcebergLog

    for sub in ("data/wh/tbl", "my table/t"):
        base = str(tmp_path / sub)
        os.makedirs(os.path.dirname(base), exist_ok=True)
        for log in (DeltaLog(base + "_d"), IcebergLog(base + "_i")):
            log.write(
                _mk(spark, [(i, "x") for i in range(30)]).coalesce(1),
                "append",
            )
            log.delete_where_mor(spark, F.col("k") < 3)
            assert log.read(spark).count() == 27, base
            log.merge_upsert(_mk(spark, [(5, "U")]), ["k"])
            got = {r.k: r.v for r in log.read(spark).collect()}
            assert got[5] == "U" and len(got) == 27, base


def test_concurrent_mor_upserts_all_land(spark, tmp_path):
    """Racing MOR writers coordinate through the same optimistic
    commit loop as CoW: all updates land, none lost, version
    sequence gap-free."""
    import threading

    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog

    src = DeltaSource(path=str(tmp_path / "t"), merge_on_read=True)
    src.insert(
        _mk(spark, [(i, "init") for i in range(20)]).coalesce(1)
    )
    errors = []

    def writer(i):
        try:
            src.upsert(_mk(spark, [(i, f"w{i}")]), keys=["k"])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(5)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    log = DeltaLog(src.path)
    assert log.latest_version() == 5  # seed + 5 merges, no gaps
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert len(got) == 20
    for i in range(5):
        assert got[i] == f"w{i}"
