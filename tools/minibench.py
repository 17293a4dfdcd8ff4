"""Bench-protocol (warm-up + min-of-3) timing for named queries.

Usage: python tools/minibench.py QUERY [QUERY ...]

Same measurement discipline as bench.py (full-row xxhash64 force,
clearCache between runs, per-query gc) without the full headline
sweep — for before/after comparison of targeted optimizations.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")


def main() -> int:
    names = sys.argv[1:]
    import __spark_entry__ as entry
    from aligned_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    extra = json.loads(os.environ.get("MINIBENCH_EXTRA_CONF", "{}"))
    spark = get_spark("minibench", extra_conf=extra or None)
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def force(df):
        df.selectExpr("sum(xxhash64(struct(*)))").collect()

    out = {}
    for name in names:
        fn = qs[name]
        force(fn(spark, sf_dir))
        spark.catalog.clearCache()
        samples = []
        for _ in range(3):
            t0 = time.time()
            force(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(samples), "runs": samples}
        print(f"{name}: min={min(samples)} runs={samples}", flush=True)
        del fn
        gc.collect()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
