"""MOR read-path cost as position-delete sidecars accumulate.

PERF.md measures the merge-on-read WRITE-side win (a delete costs a
KB sidecar instead of a part rewrite). This measures the price of
that trade on the READ side: every read applies the accumulated
pairs as an anti-join, so read time grows with the live sidecar
count until OPTIMIZE compacts them away. The sweep:

1. builds a table from sf0.1 ``lineitem`` (~600k rows, 4 parts),
2. applies N merge-on-read DELETE commits (each kills a disjoint
   ~0.1% slice — realistic small-frequent-change traffic),
3. times a full read at 1 and 10 accumulated sidecars,
4. times OPTIMIZE (compaction) and the post-OPTIMIZE read,

and prints, per format, the break-even: after how many reads the
compaction cost is repaid by the cheaper post-compaction read —
the number that tells an operator WHEN to schedule OPTIMIZE.

Usage: python tools/mor_read_sweep.py [delta|iceberg]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_COMMITS = 10


def _force(df) -> None:
    df.selectExpr("sum(xxhash64(struct(*)))").collect()


def _timed_read(spark, log) -> float:
    _force(log.read(spark))  # warm-up
    samples = []
    for _ in range(3):
        t0 = time.time()
        _force(log.read(spark))
        samples.append(time.time() - t0)
    return min(samples)


def sweep(spark, fmt: str) -> dict:
    from pyspark.sql import functions as F

    from aligned_spark.sources.file import read_parquet

    base = read_parquet(spark, f"{BASE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_shipdate",
    )
    path = tempfile.mkdtemp(prefix=f"aligned_spark_morsweep_{fmt}_")
    if fmt == "delta":
        from aligned_spark.sources.delta_log import DeltaLog

        log = DeltaLog(path)
        log.write(base.repartition(4), "append")
    else:
        from aligned_spark.sources.iceberg_log import IcebergLog

        log = IcebergLog(path)
        log.write(base.repartition(4), "append")

    out: dict = {"format": fmt, "reads": {}}
    for i in range(N_COMMITS):
        t0 = time.time()
        log.delete_where_mor(
            spark, F.col("l_orderkey") % 997 == i
        )
        if i == 0:
            out["mor_delete_sec"] = round(time.time() - t0, 3)
            out["reads"]["1_sidecar"] = round(
                _timed_read(spark, log), 3
            )
    out["reads"][f"{N_COMMITS}_sidecars"] = round(
        _timed_read(spark, log), 3
    )
    t0 = time.time()
    log.optimize(spark)
    out["optimize_sec"] = round(time.time() - t0, 3)
    out["reads"]["post_optimize"] = round(
        _timed_read(spark, log), 3
    )
    saved_per_read = (
        out["reads"][f"{N_COMMITS}_sidecars"]
        - out["reads"]["post_optimize"]
    )
    out["breakeven_reads"] = (
        round(out["optimize_sec"] / saved_per_read, 1)
        if saved_per_read > 0
        else None
    )
    return out


def main() -> None:
    from aligned_spark.session import get_spark

    spark = get_spark("mor_read_sweep")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm
    fmts = [a for a in sys.argv[1:] if a in ("delta", "iceberg")] or [
        "delta",
        "iceberg",
    ]
    for fmt in fmts:
        print(json.dumps(sweep(spark, fmt)))
    spark.stop()


if __name__ == "__main__":
    main()
