"""Pure-Python Delta transaction log (`sources/delta_log.py`) —
round-trip, MERGE file pruning, time travel, checkpoints, data
skipping, optimistic concurrency, vacuum."""

import json
import os

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=repr
    )


@pytest.fixture()
def log(tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog

    return DeltaLog(str(tmp_path / "tbl"))


def _mk(spark, pairs):
    return spark.createDataFrame(
        [Row(k=k, v=v, p=k % 2) for k, v in pairs]
    )


def test_write_read_roundtrip(spark, log):
    df = _mk(spark, [(1, "a"), (2, "b"), (3, "c")])
    assert log.write(df, "append") == 0
    back = log.read(spark)
    assert _rows(back) == _rows(df)
    assert back.schema == df.schema  # types normalized to metaData


def test_append_accumulates_and_overwrite_replaces(spark, log):
    log.write(_mk(spark, [(1, "a")]), "append")
    log.write(_mk(spark, [(2, "b")]), "append")
    assert log.read(spark).count() == 2
    log.write(_mk(spark, [(9, "z")]), "overwrite")
    assert _rows(log.read(spark)) == _rows(_mk(spark, [(9, "z")]))
    # previous versions stay readable (time travel)
    assert log.read(spark, version=1).count() == 2
    assert log.read(spark, version=0).count() == 1


def test_partitioned_write_hive_layout(spark, log, tmp_path):
    df = _mk(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")])
    log.write(df, "append", partition_by=["p"])
    snap = log.snapshot()
    assert snap.partition_columns == ["p"]
    assert all(
        a["partitionValues"].get("p") in {"0", "1"}
        for a in snap.files.values()
    )
    assert all(p.startswith("p=") for p in snap.files)
    back = log.read(spark)
    assert _rows(back) == _rows(df)
    # partition column type restored from metaData (dirs infer int)
    assert dict(back.dtypes)["p"] == "bigint"


def test_merge_upsert_rewrites_only_touched_files(spark, log):
    # two physical parts: keys 1-4 in one, 5-8 in the other
    a = _mk(spark, [(i, "old") for i in (1, 2, 3, 4)]).coalesce(1)
    b = _mk(spark, [(i, "old") for i in (5, 6, 7, 8)]).coalesce(1)
    log.write(a, "append")
    log.write(b, "append")
    assert len(log.snapshot().files) == 2
    # touch only the first part (+ a brand-new key)
    upd = _mk(spark, [(1, "NEW"), (99, "INS")])
    log.merge_upsert(upd, ["k"])
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got == {
        1: "NEW", 2: "old", 3: "old", 4: "old",
        5: "old", 6: "old", 7: "old", 8: "old", 99: "INS",
    }
    # the untouched part must NOT have been tombstoned
    removed = [
        act["remove"]["path"]
        for act in log._read_commit(2)
        if "remove" in act
    ]
    assert len(removed) == 1
    live_before = set(log.snapshot(1).files)
    assert (live_before - set(removed)) <= set(log.snapshot().files)


def test_delete_where_null_predicate_keeps_row(spark, log):
    df = spark.createDataFrame(
        [Row(k=1, v=10), Row(k=2, v=None), Row(k=3, v=30)]
    )
    log.write(df, "append")
    log.delete_where(spark, F.col("v") > 15)
    kept = sorted(r.k for r in log.read(spark).collect())
    assert kept == [1, 2]  # NULL comparison keeps the row


def test_checkpoint_compacts_replay(spark, tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "tbl"), checkpoint_interval=2)
    for i in range(5):
        log.write(_mk(spark, [(i, f"v{i}")]), "append")
    ck = os.path.join(log.log_dir, "00000000000000000004.checkpoint.parquet")
    assert os.path.isfile(ck)
    with open(os.path.join(log.log_dir, "_last_checkpoint")) as fh:
        assert json.load(fh)["version"] == 4
    full = log.snapshot()
    # force the checkpoint path: delete pre-checkpoint JSON commits
    for v in range(4):
        os.unlink(os.path.join(log.log_dir, f"{v:020d}.json"))
    snap = log.snapshot()
    assert set(snap.files) == set(full.files)
    assert log.read(spark).count() == 5
    assert snap.schema() is not None


def test_data_skipping_prunes_by_footer_stats(spark, log):
    # three parts with disjoint k ranges
    for lo in (0, 100, 200):
        log.write(
            _mk(spark, [(lo + i, "x") for i in range(10)]).coalesce(1),
            "append",
        )
    snap = log.snapshot()
    assert len(snap.files) == 3
    from aligned_spark.sources.delta_log import _file_may_match

    surviving = [
        p
        for p, a in snap.files.items()
        if _file_may_match(a, [("k", ">=", 100), ("k", "<=", 150)])
    ]
    assert len(surviving) == 1
    pruned = log.read(spark, skipping=[("k", ">=", 100), ("k", "<=", 150)])
    assert pruned.count() == 10  # only the middle file was listed
    assert (
        pruned.filter((F.col("k") >= 100) & (F.col("k") <= 150)).count()
        == 10
    )


def test_concurrent_commit_conflict_raises_and_retry_wins(spark, log):
    from aligned_spark.sources.delta_log import ConcurrentCommitError

    log.write(_mk(spark, [(1, "a")]), "append")
    # simulate a racing writer landing version 1 first
    blocker = os.path.join(log.log_dir, f"{1:020d}.json")
    with open(blocker, "w") as fh:
        fh.write('{"commitInfo":{"operation":"RACE"}}\n')
    with pytest.raises(ConcurrentCommitError):
        log.commit([], 1, "WRITE")
    # DeltaSource's retry loop re-resolves and lands at version 2
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=log.table_path)
    src.insert(_mk(spark, [(2, "b")]))
    assert log.latest_version() == 2
    assert log.read(spark).count() == 2


def test_optimize_zorder_compacts_without_datachange(spark, log):
    for i in range(4):
        log.write(
            _mk(spark, [(i * 10 + j, "x") for j in range(5)]).coalesce(1),
            "append",
        )
    before = log.read(spark)
    n_before = before.count()
    v = log.optimize(spark, zorder_by=["k", "p"])
    snap = log.snapshot(v)
    assert all(a["dataChange"] is False for a in snap.files.values())
    after = log.read(spark)
    assert after.count() == n_before
    assert _rows(after) == _rows(before)


def test_vacuum_removes_tombstoned_parts(spark, log):
    log.write(_mk(spark, [(1, "a")]), "append")
    log.write(_mk(spark, [(2, "b")]), "overwrite")
    doomed = log.vacuum(dry_run=True, retention_seconds=0)
    assert len(doomed) >= 1
    # default retention PROTECTS fresh files (concurrent writers)
    assert log.vacuum(dry_run=True) == []
    log.vacuum(retention_seconds=0)
    # current snapshot unharmed; time travel to v0 now broken by design
    assert log.read(spark).count() == 1
    parts = [
        f
        for _r, _d, fs in os.walk(log.table_path)
        for f in fs
        if f.endswith(".parquet") and "checkpoint" not in f
    ]
    assert len(parts) == len(log.snapshot().files)


def test_delta_source_upsert_roundtrip(spark, tmp_path):
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "t"), partition_by=["p"])
    src.insert(_mk(spark, [(1, "a"), (2, "b")]))
    src.upsert(_mk(spark, [(2, "B"), (3, "c")]), keys=["k"])
    got = {r.k: r.v for r in src.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    assert src.read(spark, version=0).count() == 2
    src.delete_where(spark, F.col("k") == 1)
    assert {r.k for r in src.read(spark).collect()} == {2, 3}


def test_schema_evolution_append(spark, log):
    log.write(_mk(spark, [(1, "a")]), "append")
    wider = spark.createDataFrame([Row(k=2, v="b", p=0, extra=9.5)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="merge_schema"):
        log.write(wider, "append")
    log.write(wider, "append", merge_schema=True)
    out = log.read(spark)
    assert dict(out.dtypes)["extra"] == "double"
    got = {r.k: r.extra for r in out.collect()}
    assert got == {1: None, 2: 9.5}  # old part projects NULL
    # type drift on an existing column is rejected
    drift = spark.createDataFrame([Row(k="s", v="x", p=0)])
    with _pytest.raises(ValueError, match="cannot change"):
        log.write(drift, "append", merge_schema=True)


def test_all_between_dates_skips_files(spark, tmp_path):
    import datetime as dt

    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import (
        DeltaLog,
        _file_may_match,
    )

    src = DeltaSource(path=str(tmp_path / "t"))
    for day in (1, 10, 20):
        rows = [
            Row(k=day * 100 + i, ts=dt.datetime(2024, 1, day, i))
            for i in range(3)
        ]
        src.insert(spark.createDataFrame(rows).coalesce(1))
    log = DeltaLog(src.path)
    snap = log.snapshot()
    lo, hi = dt.datetime(2024, 1, 9), dt.datetime(2024, 1, 11)
    pred = [("ts", ">=", lo.isoformat()), ("ts", "<=", hi.isoformat())]
    kept = [
        p for p, a in snap.files.items() if _file_may_match(a, pred)
    ]
    assert len(kept) == 1  # only the Jan-10 part survives skipping
    out = src.all_between_dates(spark, "ts", lo, hi)
    assert sorted(r.k for r in out.collect()) == [1000, 1001, 1002]


def test_read_changes_incremental(spark, log):
    v0 = log.write(_mk(spark, [(1, "a")]), "append")
    v1 = log.write(_mk(spark, [(2, "b"), (3, "c")]), "append")
    v2 = log.write(_mk(spark, [(4, "d")]), "append")
    # exclusive-from semantics
    assert sorted(
        r.k for r in log.read_changes(spark, v0).collect()
    ) == [2, 3, 4]
    assert sorted(
        r.k for r in log.read_changes(spark, v0, v1).collect()
    ) == [2, 3]
    assert log.read_changes(spark, v2).count() == 0
    # a MERGE rewrite re-emits survivors (documented at-least-once)
    log.merge_upsert(_mk(spark, [(1, "A")]), ["k"])
    changed = {r.k for r in log.read_changes(spark, v2).collect()}
    assert 1 in changed


def test_degenerate_empty_frames(spark, log):
    empty = spark.createDataFrame([], "k long, v string, p long")
    log.write(empty, "append")  # zero-row table is valid
    assert log.read(spark).count() == 0
    assert log.read(spark).schema == empty.schema
    log.write(_mk(spark, [(1, "a")]), "append")
    # empty MERGE source and no-match DELETE are no-op commits
    log.merge_upsert(empty, ["k"])
    log.delete_where(spark, F.col("k") > 10**9)
    assert log.read(spark).count() == 1
    assert log.vacuum(dry_run=True, retention_seconds=0) == []


def test_optimize_zorder_improves_skipping_selectivity(spark, log):
    """After OPTIMIZE ZORDER BY k, per-file k-ranges narrow, so a
    point-range predicate prunes a larger fraction of files than on
    the shuffled layout — the data-skipping payoff Z-ordering buys."""
    import random

    from aligned_spark.sources.delta_log import _file_may_match

    rng = random.Random(7)
    ks = list(range(400))
    rng.shuffle(ks)
    log.write(
        _mk(spark, [(k, "x") for k in ks]).repartition(8), "append"
    )

    def pruned_fraction():
        snap = log.snapshot()
        pred = [("k", ">=", 100), ("k", "<=", 120)]
        kept = sum(
            1 for a in snap.files.values() if _file_may_match(a, pred)
        )
        return 1 - kept / len(snap.files)

    before = pruned_fraction()
    log.optimize(spark, zorder_by=["k"], target_rows_per_file=50)
    after = pruned_fraction()
    assert after > before
    assert after >= 0.5  # narrow range hits a small file subset


def test_footer_stats_dropped_when_any_row_group_uncovered(tmp_path):
    """A column whose min/max is unusable in ANY row group must carry
    NO file-level bounds — partial bounds would prune files that
    still contain matching rows in the uncovered group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aligned_spark.sources.parts import stats_from_footer

    short = ["a", "b"]
    long_ = ["z" * 100, "z" * 100]  # > _MAX_STR_STAT → unusable
    t1 = pa.table({"v": short, "k": [1, 2]})
    t2 = pa.table({"v": long_, "k": [3, 4]})
    p = str(tmp_path / "f.parquet")
    with pq.ParquetWriter(p, t1.schema) as w:
        w.write_table(t1)  # row group 1: usable v stats
        w.write_table(t2)  # row group 2: over-long v values
    stats = stats_from_footer(p)
    assert stats["numRecords"] == 4
    assert "v" not in stats["minValues"]
    assert "v" not in stats["maxValues"]
    assert stats["minValues"]["k"] == 1
    assert stats["maxValues"]["k"] == 4


def test_footer_timestamp_stats_are_naive_utc(spark, tmp_path):
    """Stats strings must be suffix-free (naive UTC) so lexicographic
    comparison with naive predicate bounds stays chronological at
    equal instants."""
    import datetime as dt
    import glob

    from aligned_spark.sources.parts import stats_from_footer

    rows = [(1, dt.datetime(2024, 1, 10))]
    spark.createDataFrame(rows, "k long, ts timestamp").coalesce(
        1
    ).write.parquet(str(tmp_path / "t"))
    f = glob.glob(str(tmp_path / "t" / "*.parquet"))[0]
    stats = stats_from_footer(f)
    assert stats["minValues"]["ts"] == "2024-01-10T00:00:00"
    assert "+" not in stats["maxValues"]["ts"]


def test_replace_where_single_commit(spark, log):
    a = _mk(spark, [(i, "old") for i in (1, 2, 3, 4)]).coalesce(1)
    b = _mk(spark, [(i, "old") for i in (11, 12)]).coalesce(1)
    log.write(a, "append")
    log.write(b, "append")
    v_before = log.latest_version()
    repl = _mk(spark, [(2, "NEW"), (4, "NEW")])
    log.replace_where(repl, (F.col("k") % 2 == 0) & (F.col("k") < 10))
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got == {1: "old", 2: "NEW", 3: "old", 4: "NEW",
                   11: "old", 12: "old"}
    # ONE commit; the untouched 11/12 part was not tombstoned
    assert log.latest_version() == v_before + 1
    removed = [
        a_["remove"]["path"]
        for a_ in log._read_commit(v_before + 1)
        if "remove" in a_
    ]
    assert len(removed) == 1
    # inserted rows violating the predicate are rejected
    with pytest.raises(ValueError, match="violate"):
        log.replace_where(
            _mk(spark, [(5, "odd")]), F.col("k") % 2 == 0
        )


def test_concurrent_appends_all_land(spark, tmp_path):
    """8 threads race appends through the optimistic-retry loop: all
    rows land, versions are contiguous, and each commit's exclusive
    create kept the log linear."""
    import threading

    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog

    src = DeltaSource(path=str(tmp_path / "t"))
    src.insert(_mk(spark, [(0, "seed")]))
    errors = []

    def writer(i):
        try:
            src.insert(_mk(spark, [(100 + i, f"w{i}")]))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    log = DeltaLog(src.path)
    assert log.latest_version() == 8  # 0 seed + 8 appends, no gaps
    ks = sorted(r.k for r in log.read(spark).collect())
    assert ks == [0] + [100 + i for i in range(8)]


def test_store_materialize_into_delta(spark, tmp_path):
    """Full store integration: a view materializes into the
    jar-free DeltaSource (overwrite → new table version), reads back
    through the materialized fast path, and incremental refresh
    UPSERTs only the new rows as a MERGE commit."""
    import datetime as dt

    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
    )
    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    base = ParquetSource(path=str(tmp_path / "base.parquet"))
    mat = DeltaSource(path=str(tmp_path / "mat_delta"))
    schema = "user_id long, ts timestamp, value double"
    t = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [(1, t, 1.0), (2, t, 2.0)], schema
    ).write.parquet(base.path)

    @feature_view(name="delta_mat", source=base, materialized_source=mat)
    class DeltaMat:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        value = Float64()

        doubled = value * 2.0

    store = ContractStore(spark)
    store.add_view(DeltaMat)
    store.materialize("delta_mat")

    log = DeltaLog(mat.path)
    got = {r.user_id: r.doubled for r in log.read(spark).collect()}
    assert got == {1: 2.0, 2: 4.0}
    v_full = log.latest_version()

    # incremental: one new row → MERGE commit, not a rewrite
    spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 6), 5.0)], schema
    ).write.mode("append").parquet(base.path)
    store.materialize_incremental("delta_mat")
    got2 = {r.user_id: r.doubled for r in log.read(spark).collect()}
    assert got2 == {1: 2.0, 2: 4.0, 3: 10.0}
    ops = [h["operation"] for h in log.history()]
    assert "MERGE" in ops
    assert log.latest_version() == v_full + 1


def test_replace_where_validates_schema_and_creates_fresh(spark, tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"))
    # fresh table: replaceWhere CREATES it (delta-spark parity)
    log.replace_where(_mk(spark, [(2, "a")]), F.col("k") % 2 == 0)
    assert log.read(spark).count() == 1
    # extra columns are rejected — replaceWhere never evolves
    wider = spark.createDataFrame([Row(k=4, v="x", p=0, extra=1.0)])
    with pytest.raises(ValueError, match="not in the table schema"):
        log.replace_where(wider, F.col("k") % 2 == 0)
    # type drift on an existing column is rejected at write time
    drift = spark.createDataFrame([Row(k=4, v=9, p=0)])
    with pytest.raises(ValueError, match="cannot change"):
        log.replace_where(drift, F.col("k") % 2 == 0)


def test_iceberg_source_overwrite_evolves_with_flag(spark, tmp_path):
    from aligned_spark.sources.iceberg import IcebergSource

    src = IcebergSource(path=str(tmp_path / "t"), merge_schema=True)
    src.insert(_mk(spark, [(1, "a")]))
    wider = spark.createDataFrame([Row(k=9, v="z", p=1, extra=5.0)])
    src.overwrite(wider)  # merge_schema forwarded → widens, no raise
    out = src.read(spark)
    assert dict(out.dtypes)["extra"] == "double"
    assert {r.k for r in out.collect()} == {9}
