"""Regression tests for the round-7 ADVICE fixes.

1. Iceberg stale-writer commits collide instead of silently dropping
   a concurrent snapshot (covered in ``test_iceberg_log.py``).
2. Delta commit JSON writes ``add.stats`` as a serialized JSON
   STRING (the protocol's wire form) while the in-memory snapshot
   keeps the parsed dict the skipping code consumes; legacy
   object-form commits still replay.
3. Delta ``overwrite`` preserves the table ``id``/``createdTime``
   and rejects a schema change without ``merge_schema=True``.
4. Object-store spill-cache eviction is two-phase (mark, then delete
   after a grace window) so lazy frames from earlier reads keep
   working after a remote rewrite.
"""

import json
import os
import time

from pyspark.sql import Row


# ---------------------------------------------------------------- 2


def _log(tmp_path):
    from aligned_spark.sources.delta_log import DeltaLog

    return DeltaLog(str(tmp_path / "tbl"))


def test_delta_commit_stats_is_json_string_on_wire(spark, tmp_path):
    log = _log(tmp_path)
    df = spark.createDataFrame([Row(k=1, v="a"), Row(k=9, v="b")])
    log.write(df, "append")
    commit = os.path.join(log.log_dir, "0" * 20 + ".json")
    adds = [
        json.loads(ln)["add"]
        for ln in open(commit, encoding="utf-8")
        if '"add"' in ln
    ]
    assert adds, "commit 0 has no add actions"
    for a in adds:
        if a.get("stats") is None:
            continue
        # wire form: a STRING that parses into the stats object
        assert isinstance(a["stats"], str)
        parsed = json.loads(a["stats"])
        assert "minValues" in parsed or "numRecords" in parsed
    # replay parses it back to the dict form skipping consumes
    snap = log.snapshot()
    st = [f.get("stats") for f in snap.files.values()]
    assert any(isinstance(s, dict) for s in st)
    # and skipping still prunes on it
    assert log.read(spark, skipping=[("k", ">=", 1)]).count() == 2


def test_delta_legacy_object_stats_still_replays(spark, tmp_path):
    log = _log(tmp_path)
    df = spark.createDataFrame([Row(k=1)])
    log.write(df, "append")
    commit = os.path.join(log.log_dir, "0" * 20 + ".json")
    lines = open(commit, encoding="utf-8").read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "add" in a and isinstance(a["add"].get("stats"), str):
            a["add"]["stats"] = json.loads(a["add"]["stats"])
        out.append(json.dumps(a, separators=(",", ":")))
    with open(commit, "w", encoding="utf-8") as fh:
        fh.write("\n".join(out) + "\n")
    snap = log.snapshot()
    st = [f.get("stats") for f in snap.files.values()]
    assert all(s is None or isinstance(s, dict) for s in st)
    assert log.read(spark).count() == 1


# ---------------------------------------------------------------- 3


def test_delta_overwrite_keeps_table_identity(spark, tmp_path):
    log = _log(tmp_path)
    df = spark.createDataFrame([Row(k=1, v="a")])
    log.write(df, "append")
    meta0 = log.snapshot().metadata
    log.write(spark.createDataFrame([Row(k=2, v="b")]), "overwrite")
    meta1 = log.snapshot().metadata
    assert meta1["id"] == meta0["id"]
    assert meta1["createdTime"] == meta0["createdTime"]
    assert log.read(spark).count() == 1


def test_delta_overwrite_schema_change_needs_flag(spark, tmp_path):
    import pytest

    log = _log(tmp_path)
    log.write(spark.createDataFrame([Row(k=1, v="a")]), "append")
    widened = spark.createDataFrame([Row(k=2, v="b", w=1.5)])
    with pytest.raises(ValueError, match="merge_schema"):
        log.write(widened, "overwrite")
    log.write(widened, "overwrite", merge_schema=True)
    snap = log.snapshot()
    assert {f.name for f in snap.schema().fields} == {"k", "v", "w"}
    assert log.read(spark).count() == 1


# ---------------------------------------------------------------- 4


def test_spill_eviction_two_phase(tmp_path):
    from aligned_spark.sources.spill import evict_superseded

    spill = str(tmp_path)
    old = os.path.join(spill, "data__etag1__f.parquet")
    new = os.path.join(spill, "data__etag2__f.parquet")
    for p in (old, new):
        with open(p, "w") as fh:
            fh.write("x")
    # phase 1: marks, does NOT delete
    evict_superseded(spill, "data__*__f.parquet", keep=new)
    assert os.path.exists(old)
    assert os.path.exists(old + ".superseded")
    # still inside grace: survives a second pass
    evict_superseded(spill, "data__*__f.parquet", keep=new)
    assert os.path.exists(old)
    # age the marker past the window → deleted
    past = time.time() - 10
    os.utime(old + ".superseded", (past, past))
    evict_superseded(
        spill, "data__*__f.parquet", keep=new, grace_seconds=5
    )
    assert not os.path.exists(old)
    assert not os.path.exists(old + ".superseded")
    assert os.path.exists(new)


def test_s3_read_survives_remote_rewrite(spark, tmp_path):
    """The end-to-end shape of the r6 ADVICE finding: read(), remote
    rewrite, read() again, then evaluate the FIRST frame."""
    import pytest

    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")

    from aligned_spark.sources.s3 import S3Source

    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="data")
        src = S3Source(
            bucket="data",
            prefix="t/",
            format="csv",
            csv_options={"header": "true", "inferSchema": "true"},
            client_factory=lambda: boto3.client(
                "s3", region_name="us-east-1"
            ),
            spill_dir=str(tmp_path / "spill"),
        )
        client.put_object(Bucket="data", Key="t/a.csv", Body="k\n1\n2\n")
        df1 = src.read(spark)
        client.put_object(Bucket="data", Key="t/a.csv", Body="k\n7\n")
        df2 = src.read(spark)
        # the lazy first frame must still evaluate (old generation
        # survives inside the grace window)
        assert df1.count() == 2
        assert df2.count() == 1


# ---------------------------------- CHECK constraints + TIMESTAMP AS OF


def test_delta_check_constraints_enforced(spark, tmp_path):
    """Protocol delta.constraints.*: adding validates existing rows,
    every later write path rejects violating batches whole, dropping
    re-opens the gate."""
    import pytest
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"))
    log.write(
        spark.createDataFrame([Row(k=1, v=10.0), Row(k=2, v=20.0)]),
        "append",
    )
    with pytest.raises(ValueError, match="existing row"):
        log.add_constraint(spark, "v_big", "v > 15")
    log.add_constraint(spark, "v_pos", "v > 0")
    assert log.constraints() == {"v_pos": "v > 0"}
    with pytest.raises(ValueError, match="CHECK constraint"):
        log.write(spark.createDataFrame([Row(k=3, v=-1.0)]), "append")
    with pytest.raises(ValueError, match="CHECK constraint"):
        log.merge_upsert(
            spark.createDataFrame([Row(k=1, v=-5.0)]), ["k"]
        )
    with pytest.raises(ValueError, match="CHECK constraint"):
        log.merge_upsert_mor(
            spark.createDataFrame([Row(k=1, v=-5.0)]), ["k"]
        )
    # NULL fails a CHECK (SQL semantics: not TRUE -> reject)
    with pytest.raises(ValueError, match="CHECK constraint"):
        log.write(
            spark.createDataFrame([(4, None)], "k long, v double"),
            "append",
        )
    log.write(spark.createDataFrame([Row(k=5, v=5.0)]), "append")
    log.drop_constraint("v_pos")
    log.write(spark.createDataFrame([Row(k=6, v=-1.0)]), "append")
    assert log.read(spark).count() == 4


def test_timestamp_as_of_both_formats(spark, tmp_path):
    import time

    from pyspark.sql import Row

    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.sources.iceberg_log import IcebergLog

    dlog = DeltaLog(str(tmp_path / "d"))
    dlog.write(spark.createDataFrame([Row(k=1)]), "append")
    t_mid = int(time.time() * 1000)
    time.sleep(0.01)
    dlog.write(spark.createDataFrame([Row(k=2)]), "append")
    assert dlog.version_at(t_mid) == 0
    assert dlog.read(spark, version=dlog.version_at(t_mid)).count() == 1
    assert dlog.version_at(int(time.time() * 1000)) == 1

    ilog = IcebergLog(str(tmp_path / "i"))
    s0 = ilog.write(spark.createDataFrame([Row(k=1)]), "append")
    t_mid = int(time.time() * 1000)
    time.sleep(0.01)
    ilog.write(spark.createDataFrame([Row(k=2)]), "append")
    assert ilog.snapshot_as_of(t_mid) == s0
    assert ilog.read(spark, snapshot_id=ilog.snapshot_as_of(t_mid)).count() == 1


def test_delta_restore_rolls_back_as_new_commit(spark, tmp_path):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aligned_spark.sources.delta_log import DeltaLog

    log = DeltaLog(str(tmp_path / "t"))
    log.write(spark.createDataFrame([Row(k=i) for i in range(5)]), "append")
    log.merge_upsert(spark.createDataFrame([Row(k=99)]), ["k"])
    log.delete_where(spark, F.col("k") < 2)
    assert log.read(spark).count() == 4  # 2..4 + 99
    v = log.restore(0)
    assert v == log.latest_version()
    assert sorted(r.k for r in log.read(spark).collect()) == [0, 1, 2, 3, 4]
    # history preserved: the pre-restore head is still travelable
    assert log.read(spark, version=v - 1).count() == 4
    # restore interoperates with MOR state
    log.delete_where_mor(spark, F.col("k") == 0)
    v2 = log.restore(v)  # back to the un-deleted state
    assert sorted(r.k for r in log.read(spark).collect()) == [0, 1, 2, 3, 4]
    d = log.detail()
    assert d["numRows"] == 5 and d["numDeleteFiles"] == 0
    assert d["version"] == v2


def test_iceberg_rollback_moves_pointer(spark, tmp_path):
    from pyspark.sql import Row

    from aligned_spark.sources.iceberg_log import IcebergLog

    log = IcebergLog(str(tmp_path / "t"))
    s0 = log.write(spark.createDataFrame([Row(k=1)]), "append")
    log.write(spark.createDataFrame([Row(k=2)]), "append")
    assert log.read(spark).count() == 2
    log.rollback_to(s0)
    assert log.read(spark).count() == 1
    d = log.detail()
    assert d["numRows"] == 1 and d["currentSnapshotId"] == s0
    assert d["numSnapshots"] == 2  # snapshots kept, pointer moved
    import pytest

    with pytest.raises(ValueError, match="unknown snapshot"):
        log.rollback_to(123456)
