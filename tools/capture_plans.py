"""Capture ``explain("formatted")`` for declared queries.

Usage: python tools/capture_plans.py OUTDIR SUFFIX [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query (default: the
bench HEADLINE set). Side-effecting queries (the IVM/CDF families
build their tables while constructing the DataFrame) run their build
as part of capture — the captured plan is the final read, which is
what the returned DataFrame computes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import bench
    import __spark_entry__ as entry
    from aligned_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    qs = entry.queries()
    if not names:
        names = list(bench.HEADLINE)
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"CAPTURE ERROR: {e!r}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}", flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
