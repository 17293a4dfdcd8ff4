"""Object-store commit coordination (`sources/log_store.py`): the
Delta log hosted on S3 with native conditional-put (PutObject
IfNoneMatch="*") as the put-if-absent primitive — the coordination
upstream Delta needs a DynamoDB sidecar for. Data parts stay on the
table path (the coordination-service split); only the log's
atomicity moves to the object store. moto enforces IfNoneMatch, so
the race tests are real."""

import threading

import pytest

from pyspark.sql import Row

moto = pytest.importorskip("moto")


@pytest.fixture()
def s3_client():
    from moto import mock_aws

    with mock_aws():
        import boto3

        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="lake")
        yield client


def _store(client, prefix="tbl/_delta_log"):
    from aligned_spark.sources.log_store import S3LogStore

    return S3LogStore(
        bucket="lake", prefix=prefix, client_factory=lambda: client
    )


# ------------------------------------------------------- primitives


def test_filesystem_put_exclusive_is_put_if_absent(tmp_path):
    from aligned_spark.sources.log_store import (
        ConcurrentCommitError,
        FileSystemLogStore,
    )

    st = FileSystemLogStore(str(tmp_path / "log"))
    st.put_exclusive("00.json", b"a")
    with pytest.raises(ConcurrentCommitError):
        st.put_exclusive("00.json", b"b")
    assert st.read_text("00.json") == "a"  # winner's bytes survive


def test_s3_put_exclusive_is_put_if_absent(s3_client):
    from aligned_spark.sources.log_store import ConcurrentCommitError

    st = _store(s3_client)
    st.put_exclusive("00.json", b"winner")
    with pytest.raises(ConcurrentCommitError):
        st.put_exclusive("00.json", b"loser")
    assert st.read_text("00.json") == "winner"
    assert sorted(st.list_names()) == ["00.json"]
    st.put_atomic("_last_checkpoint", b"{}")  # overwrite-allowed
    st.put_atomic("_last_checkpoint", b'{"version": 1}')
    assert st.read_text("_last_checkpoint") == '{"version": 1}'


# ------------------------------------------- DeltaLog on an S3 log


def test_delta_log_full_cycle_on_s3(spark, s3_client, tmp_path):
    """Write/append/merge/time-travel with the transaction log
    living entirely in S3, crossing a checkpoint boundary so the
    checkpoint parquet round-trips through object bytes too."""
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(
        str(tmp_path / "t"),
        checkpoint_interval=3,
        log_store=_store(s3_client),
    )
    log.write(spark.createDataFrame([Row(k=1, v="a")]), "append")
    log.write(spark.createDataFrame([Row(k=2, v="b")]), "append")
    log.write(spark.createDataFrame([Row(k=3, v="c")]), "append")
    log.write(spark.createDataFrame([Row(k=4, v="d")]), "append")
    assert log.latest_version() == 3
    # checkpoint at v3 exists as an s3 object and accelerates replay
    names = log.log_store.list_names()
    assert any(n.endswith(".checkpoint.parquet") for n in names)
    assert log._last_checkpoint() == 3
    assert log.read(spark).count() == 4
    log.merge_upsert(spark.createDataFrame([Row(k=2, v="B")]), ["k"])
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # time travel replays S3-hosted commits
    assert log.snapshot(0).version == 0
    assert log.read(spark, version=1).count() == 2
    # nothing under the local _delta_log dir — the log is remote
    import os

    assert not os.path.isdir(log.log_dir)


def test_delta_s3_commit_race_loser_sees_winner(spark, s3_client, tmp_path):
    """Two writers prepare against the same snapshot; the first
    conditional put wins, the second gets ConcurrentCommitError
    (never a silent overwrite)."""
    from aligned_spark.sources.delta_log import (
        ConcurrentCommitError,
        DeltaLog,
    )

    log = DeltaLog(str(tmp_path / "t"), log_store=_store(s3_client))
    log.write(spark.createDataFrame([Row(k=0, v="seed")]), "append")
    log.commit([], 1, "WRITE")  # the interloper lands v1 first
    with pytest.raises(ConcurrentCommitError):
        log.commit([], 1, "WRITE")
    assert log.latest_version() == 1


def test_concurrent_appends_all_land_on_s3(spark, s3_client, tmp_path):
    """The b0a67ef stress test re-run against a moto-backed
    _delta_log: racing writers coordinate purely through S3
    conditional puts; all rows land, version sequence is gap-free."""
    from aligned_spark.sources.delta import DeltaSource
    from aligned_spark.sources.delta_log import DeltaLog

    src = DeltaSource(
        path=str(tmp_path / "t"), log_store=_store(s3_client)
    )
    src.insert(spark.createDataFrame([Row(k=0, v="seed")]))
    errors = []

    def writer(i):
        try:
            src.insert(
                spark.createDataFrame([Row(k=100 + i, v=f"w{i}")])
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    log = DeltaLog(src.path, log_store=_store(s3_client))
    assert log.latest_version() == 6  # seed + 6 appends, no gaps
    ks = sorted(r.k for r in log.read(spark).collect())
    assert ks == [0] + [100 + i for i in range(6)]


# ---------------------------------------- IcebergLog on an S3 store


def test_iceberg_version_commits_on_s3(spark, s3_client, tmp_path):
    """Iceberg version files (the race-sensitive commit point) host
    on S3 with conditional-put coordination; manifests stay on the
    table path (immutable content, no coordination need)."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    st = _store(s3_client, prefix="tbl/metadata")
    log = IcebergLog(str(tmp_path / "t"), commit_store=st)
    log.write(spark.createDataFrame([Row(k=1, v="a")]), "append")
    log.write(spark.createDataFrame([Row(k=2, v="b")]), "append")
    log.merge_upsert(spark.createDataFrame([Row(k=2, v="B")]), ["k"])
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got == {1: "a", 2: "B"}
    names = st.list_names()
    assert "v3.metadata.json" in names and "version-hint.text" in names
    # time travel across S3-hosted versions
    ids = log.snapshot_ids()
    assert log.read(spark, snapshot_id=ids[0]).count() == 1


def test_iceberg_s3_commit_race_loser_collides(spark, s3_client, tmp_path):
    """Two writers build from the same metadata snapshot; the second
    conditional put collides instead of silently dropping the
    interloper's snapshot."""
    from aligned_spark.sources.delta_log import ConcurrentCommitError
    from aligned_spark.sources.iceberg_log import IcebergLog

    st = _store(s3_client, prefix="tbl/metadata")
    log = IcebergLog(str(tmp_path / "t"), commit_store=st)
    log.write(spark.createDataFrame([Row(k=0, v="seed")]), "append")
    stale = log.current_metadata()  # both writers read v1
    log.write(spark.createDataFrame([Row(k=1, v="w1")]), "append")
    with pytest.raises(ConcurrentCommitError):
        log._commit_metadata(dict(stale), stale["__read-version"] + 1)


def test_iceberg_concurrent_appends_all_land_on_s3(
    spark, s3_client, tmp_path
):
    from aligned_spark.sources.iceberg import IcebergSource
    from aligned_spark.sources.iceberg_log import IcebergLog

    st = _store(s3_client, prefix="tbl/metadata")
    src = IcebergSource(
        path=str(tmp_path / "t"), commit_store=st
    )
    src.insert(spark.createDataFrame([Row(k=0, v="seed")]))
    errors = []

    def writer(i):
        try:
            src.insert(
                spark.createDataFrame([Row(k=100 + i, v=f"w{i}")])
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    log = IcebergLog(src.path, commit_store=st)
    ks = sorted(r.k for r in log.read(spark).collect())
    assert ks == [0] + [100 + i for i in range(4)]
    assert len(log.snapshot_ids()) == 5  # seed + 4, none dropped


def test_exactly_once_txn_survives_on_s3(spark, s3_client, tmp_path):
    """txn actions (streaming exactly-once replay guard) replay from
    S3-hosted commits like local ones."""
    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"), log_store=_store(s3_client))
    log.write(
        spark.createDataFrame([Row(k=1)]),
        "append",
        txn=("app-1", 7),
    )
    assert log.txn_version("app-1") == 7
    assert log.txn_version("other") is None


# ------------------------------------------- LIST memoization (r8)


class _CountingClient:
    """boto3-client proxy counting LIST (via get_paginator) and HEAD
    calls — the cache contract under test is about S3 round-trips."""

    def __init__(self, inner):
        self._inner = inner
        self.lists = 0
        self.heads = 0

    def get_paginator(self, op):
        if op == "list_objects_v2":
            self.lists += 1
        return self._inner.get_paginator(op)

    def head_object(self, **kw):
        self.heads += 1
        return self._inner.head_object(**kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _counting_store(client, prefix="tbl/_delta_log"):
    from aligned_spark.sources.log_store import S3LogStore

    counter = _CountingClient(client)
    return (
        S3LogStore(
            bucket="lake",
            prefix=prefix,
            client_factory=lambda: counter,
        ),
        counter,
    )


def test_unchanged_table_reads_cost_one_list(spark, s3_client, tmp_path):
    """N snapshot resolutions of an UNCHANGED table = 1 LIST (the
    rest are memoized; freshness is one HEAD probe of the next dense
    version, never a re-LIST)."""
    from aligned_spark.sources.delta_log import DeltaLog

    seed = DeltaLog(str(tmp_path / "t"), log_store=_store(s3_client))
    seed.write(spark.createDataFrame([Row(k=1, v="a")]), "append")
    seed.write(spark.createDataFrame([Row(k=2, v="b")]), "append")

    store, counter = _counting_store(s3_client)
    log = DeltaLog(str(tmp_path / "t"), log_store=store)
    for _ in range(5):
        assert log.latest_version() == 1
    assert counter.lists == 1, counter.lists
    assert counter.heads >= 1  # dense-version freshness probes


def test_external_commit_detected_despite_cache(
    spark, s3_client, tmp_path
):
    """A reader holding a memoized listing still sees another
    writer's commit: the HEAD probe of the next dense version hits,
    the cache drops, and exactly one more LIST refreshes it."""
    from aligned_spark.sources.delta_log import DeltaLog

    seed = DeltaLog(str(tmp_path / "t"), log_store=_store(s3_client))
    seed.write(spark.createDataFrame([Row(k=1, v="a")]), "append")

    store, counter = _counting_store(s3_client)
    reader = DeltaLog(str(tmp_path / "t"), log_store=store)
    assert reader.latest_version() == 0
    assert counter.lists == 1
    # external writer (separate store instance → separate cache)
    seed.write(spark.createDataFrame([Row(k=2, v="b")]), "append")
    assert reader.latest_version() == 1  # probe hit → re-list
    assert counter.lists == 2
    assert reader.read(spark).count() == 2


def test_lost_conditional_put_invalidates_cache(
    spark, s3_client, tmp_path
):
    """A writer whose conditional put loses re-resolves against a
    FRESH listing (the 412 is proof the memo is stale)."""
    from aligned_spark.sources.delta_log import (
        ConcurrentCommitError,
        DeltaLog,
    )

    store_a, _ = _counting_store(s3_client)
    a = DeltaLog(str(tmp_path / "t"), log_store=store_a)
    a.write(spark.createDataFrame([Row(k=0, v="seed")]), "append")
    b = DeltaLog(str(tmp_path / "t"), log_store=_store(s3_client))
    b.commit([], 1, "WRITE")  # interloper lands v1 first
    with pytest.raises(ConcurrentCommitError):
        a.commit([], 1, "WRITE")
    assert store_a._names_cache is None  # provably-stale memo dropped
    assert a.latest_version() == 1  # retry sees the winner


def test_iceberg_unchanged_table_reads_cost_one_list(
    spark, s3_client, tmp_path
):
    from aligned_spark.sources.iceberg_log import IcebergLog

    seed = IcebergLog(
        str(tmp_path / "ice"),
        commit_store=_store(s3_client, prefix="ice/metadata"),
    )
    seed.write(spark.createDataFrame([Row(k=1)]), "append")
    seed.write(spark.createDataFrame([Row(k=2)]), "append")

    store, counter = _counting_store(s3_client, prefix="ice/metadata")
    log = IcebergLog(str(tmp_path / "ice"), commit_store=store)
    first = log.current_metadata()["current-snapshot-id"]
    for _ in range(4):
        assert log.current_metadata()["current-snapshot-id"] == first
    assert counter.lists == 1, counter.lists
    # external snapshot lands → probe detects, one more LIST
    seed.write(spark.createDataFrame([Row(k=3)]), "append")
    assert log.current_metadata()["current-snapshot-id"] != first
    assert counter.lists == 2
