"""Merge-machinery parallelism contour (r13 VERDICT task 6).

At sf0.1 the benched IVM slices are tiny (~70k rows), so the 8-vs-32
core ratio reads ~1 and says nothing about whether the maintenance
DATA PLANE parallelizes. This contour scales the slice ~10x: base =
lineitem (600k rows, sf0.1), full build, then one refresh whose CDC
slice updates half the base (~300k rows) and inserts ~85k more.
Run it twice, SPARK_GRAFT_CPUS=8 and =32, and compare the refresh
seconds: the slice work should speed up with cores while the commit
floor stays fixed.

Usage: SPARK_GRAFT_CPUS=N python tools/ivm_scale_contour.py
Prints one JSON line {"cpus": N, "build_sec": .., "refresh_sec": ..}.
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


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from aligned_spark.session import get_spark
    from aligned_spark.sources.delta import DeltaSource

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ivm_contour")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def one_pass() -> tuple[float, float]:
        base = entry._t(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_returnflag",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
        ).withColumn(
            "__rid",
            F.col("l_orderkey") * 16 + F.col("l_linenumber"),
        )
        root = tempfile.mkdtemp(prefix="aligned_ivm_contour_")
        src = DeltaSource(path=f"{root}/base")
        src.insert(base.repartition(16))
        agg = IncrementalAggregate(
            source=src,
            target_path=f"{root}/agg",
            group_keys=["l_returnflag", "l_suppkey"],
            sums=["price_cents"],
        )
        t0 = time.time()
        agg.refresh(spark)  # full build
        t_build = time.time() - t0
        upd = base.filter(F.col("l_orderkey") % 2 == 0).withColumn(
            "price_cents", F.col("price_cents") * 2
        )
        ins = base.filter(F.col("l_orderkey") % 7 == 0).withColumn(
            "__rid", F.col("__rid") + F.lit(100_000_000)
        )
        src.upsert(upd.unionByName(ins), keys=["__rid"])
        t0 = time.time()
        agg.refresh(spark)  # the ~385k-row slice
        t_refresh = time.time() - t0
        return t_build, t_refresh

    one_pass()  # warm-up (JIT/codegen)
    builds, refreshes = [], []
    for _ in range(3):
        b, r = one_pass()
        builds.append(round(b, 3))
        refreshes.append(round(r, 3))
    print(
        json.dumps(
            {
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                "build_sec": min(builds),
                "refresh_sec": min(refreshes),
                "builds": builds,
                "refreshes": refreshes,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
