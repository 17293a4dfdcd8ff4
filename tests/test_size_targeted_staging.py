"""Size-targeted staged writes (`sources/parts._size_targeted`).

A SMALL commit must not inherit the plan's full shuffle
partitioning (dozens of KB-sized parts that every later discovery
scan and footer harvest re-enumerates); it coalesces to its
byte-targeted file count. Explicit caller layouts (repartition /
repartitionByRange / coalesce at the frame root) and a disabled
target are respected verbatim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aligned_spark.sources import parts as parts_mod
from aligned_spark.sources.delta_log import DeltaLog
from aligned_spark.sources.iceberg_log import IcebergLog


def _spread(spark, n=5_000):
    # a shuffle (groupBy) so the frame arrives with many partitions
    return (
        spark.range(n)
        .groupBy((F.col("id") % 500).alias("k"))
        .agg(F.sum("id").alias("v"))
    )


def test_small_delta_write_coalesces_to_one_part(spark, tmp_path):
    log = DeltaLog(str(tmp_path / "t"))
    log.write(_spread(spark))
    assert len(log.snapshot().files) == 1


def test_small_iceberg_merge_stays_one_part(spark, tmp_path):
    log = IcebergLog(str(tmp_path / "t"))
    log.write(_spread(spark))
    log.merge_upsert(
        spark.range(100).selectExpr("id as k", "id * 7 as v"), ["k"]
    )
    files = log._resolve().files
    assert len(files) == 1
    got = {
        r["k"]: r["v"]
        for r in log.read(spark).collect()
    }
    assert got[3] == 21  # merged row
    assert len(got) == 500


def test_explicit_repartition_is_respected(spark, tmp_path):
    log = DeltaLog(str(tmp_path / "t"))
    log.write(_spread(spark).repartition(6))
    assert len(log.snapshot().files) == 6


def _narrow4(spark):
    # parallelize keeps its 4 partitions through a narrow plan — no
    # exchange, so AQE never coalesces it and the partition count
    # reaching the writer is deterministic
    return spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, float(i)) for i in range(400)], 4
        ),
        "k long, v double",
    )


def test_zero_target_disables_coalescing(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(parts_mod, "TARGET_FILE_BYTES", 0)
    log = DeltaLog(str(tmp_path / "t"))
    log.write(_narrow4(spark))
    assert len(log.snapshot().files) == 4


def test_small_narrow_scan_write_coalesces(spark, tmp_path):
    # RDD-backed frames carry no size stats (defaultSizeInBytes =
    # unbounded) so _narrow4 writes its 4 partitions verbatim; a
    # SCAN of those files has real byte stats and coalesces
    src = DeltaLog(str(tmp_path / "src"))
    src.write(_narrow4(spark))
    assert len(src.snapshot().files) == 4
    log = DeltaLog(str(tmp_path / "t"))
    log.write(src.read(spark).filter("k >= 0"))
    assert len(log.snapshot().files) == 1
