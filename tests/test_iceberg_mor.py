"""Iceberg v2 merge-on-read (`iceberg_log.py` position deletes): a
small delete/upsert writes one tiny (file_path, pos) delete file and
rewrites ZERO data parts; reads apply the pairs via an anti-join on
the scan's ``_metadata`` (file, row_index); compaction purges them;
CDC reconstructs the same feed as copy-on-write."""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture()
def log(tmp_path):
    from aligned_spark.sources.iceberg_log import IcebergLog

    return IcebergLog(str(tmp_path / "tbl"))


def _mk(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])


def test_mor_delete_writes_no_data_parts(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(100)]).coalesce(1),
        "append",
    )
    before = set(log._resolve().files)
    log.delete_where_mor(spark, F.col("k") < 10)
    view = log._resolve()
    assert set(view.files) == before  # zero data parts rewritten
    assert len(view.delete_files) >= 1
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == list(range(10, 100))
    # v2 feature recorded; null predicate semantics preserved
    assert log.current_metadata()["format-version"] == 2
    sid = log.snapshot_ids()[-1]
    log.delete_where_mor(spark, F.lit(None).cast("boolean"))
    assert log.snapshot_ids()[-1] == sid  # no-op, no empty commit


def test_mor_merge_appends_and_masks(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(50)]).coalesce(1),
        "append",
    )
    before = set(log._resolve().files)
    log.merge_upsert_mor(
        _mk(spark, [(7, "UPD"), (999, "NEW")]), ["k"]
    )
    view = log._resolve()
    assert before <= set(view.files)  # old parts intact, one added
    assert len(view.delete_files) == 1
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[7] == "UPD" and got[999] == "NEW" and len(got) == 51
    # repeated MOR merges stack correctly
    log.merge_upsert_mor(_mk(spark, [(7, "UPD2")]), ["k"])
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[7] == "UPD2" and len(got) == 51


def test_mor_cdc_matches_cow_semantics(spark, log):
    log.write(
        _mk(spark, [(i, f"v{i}") for i in range(100)]).coalesce(1),
        "append",
    )
    s0 = log.snapshot_ids()[-1]
    log.merge_upsert_mor(
        _mk(spark, [(5, "UPD"), (500, "NEW")]), ["k"]
    )
    log.delete_where_mor(spark, F.col("k") == 6)
    ch = log.read_changes(spark, s0)
    got = {
        (r.k, r._change_type): r.v for r in ch.collect()
    }
    assert got == {
        (5, "update_preimage"): "v5",
        (5, "update_postimage"): "UPD",
        (500, "insert"): "NEW",
        (6, "delete"): "v6",
    }
    # a MOR-deleted row must NOT re-emit from a later delete slice
    s1 = log.snapshot_ids()[-1]
    log.delete_where_mor(spark, F.col("k") < 8)  # 5(UPD),0-4,7; not 6
    dead = {r.k for r in log.read_changes(spark, s1).collect()}
    assert dead == {0, 1, 2, 3, 4, 5, 7}


def test_mor_cow_interplay_no_resurrection(spark, log):
    """A copy-on-write rewrite of parts that carry position deletes
    must not resurrect the dead rows."""
    log.write(
        _mk(spark, [(i, "x") for i in range(20)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") == 3)
    # CoW merge touches the same (single) part
    log.merge_upsert(_mk(spark, [(4, "UPD")]), ["k"])
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(20) if i != 3]
    assert {r.v for r in log.read(spark).filter(F.col("k") == 4).collect()} == {"UPD"}
    # CoW delete too
    log.delete_where(spark, F.col("k") == 5)
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(20) if i not in (3, 5)]


def test_optimize_purges_delete_files(spark, log):
    log.write(
        _mk(spark, [(i, "x") for i in range(40)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") % 4 == 0)
    assert log._resolve().delete_files
    log.optimize(spark)
    view = log._resolve()
    assert not view.delete_files  # compacted away
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == [i for i in range(40) if i % 4 != 0]


def test_expire_keeps_referenced_delete_files(spark, log, tmp_path):
    import os

    log.write(
        _mk(spark, [(i, "x") for i in range(30)]).coalesce(1),
        "append",
    )
    log.delete_where_mor(spark, F.col("k") < 3)
    log.write(_mk(spark, [(100, "y")]), "append")
    log.expire_snapshots(keep_last=1, retention_seconds=0)
    # the delete file is still referenced by the head snapshot
    assert log._resolve().delete_files
    got = sorted(r.k for r in log.read(spark).collect())
    assert got == list(range(3, 30)) + [100]


def test_source_merge_on_read_routing(spark, tmp_path):
    from aligned_spark.sources.iceberg import IcebergSource
    from aligned_spark.sources.iceberg_log import IcebergLog

    src = IcebergSource(
        path=str(tmp_path / "t"), merge_on_read=True
    )
    src.insert(_mk(spark, [(i, "x") for i in range(10)]).coalesce(1))
    before = set(IcebergLog(src.path)._resolve().files)
    src.upsert(_mk(spark, [(1, "U")]), keys=["k"])
    src.delete_where(spark, F.col("k") == 2)
    view = IcebergLog(src.path)._resolve()
    assert before <= set(view.files)  # no rewrites, appends only
    assert len(view.delete_files) == 2
    got = {r.k: r.v for r in src.read(spark).collect()}
    assert got[1] == "U" and 2 not in got and len(got) == 9


def test_mor_with_special_char_partition_values(spark, tmp_path):
    """Partition values with spaces and '+' percent-encode in
    _metadata.file_path; the rel-path derivation must decode %XX
    (and ONLY %XX — '+' stays literal) or CoW rewrites and delete
    pairs point at nonexistent files."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    log = IcebergLog(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [Row(k=i, p="NOT SPECIFIED" if i % 2 else "a+b", v=i)
         for i in range(20)]
    )
    log.write(df.coalesce(1), "append", partition_by=["p"])
    # MOR delete on the encoded-partition files
    log.delete_where_mor(spark, F.col("k") < 4)
    assert log.read(spark).count() == 16
    # CoW merge over the same files (touched paths must decode)
    log.merge_upsert(
        spark.createDataFrame([Row(k=5, p="NOT SPECIFIED", v=99)]),
        ["k"],
    )
    got = {r.k: r.v for r in log.read(spark).collect()}
    assert got[5] == 99 and len(got) == 16
