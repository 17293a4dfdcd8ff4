"""Lifecycle decomposition for the Structured-Streaming queries.

Usage: python tools/profile_stream.py QUERY [QUERY ...]

Runs each query once untimed (warm-up, bench protocol), then once
timed with wall-clock split across the streaming lifecycle phases:

- ``build``      — table construction (DeltaLog/IcebergLog write,
                   merge_upsert, delete_where commits)
- ``start``      — ``DataStreamWriter.start`` (source resolution,
                   Python data-source worker spawn, first planning)
- ``drain``      — ``processAllAvailable`` (micro-batch planning +
                   execution + sink/offset-log commits)
- ``stop``       — ``stop`` + ``awaitTermination``
- ``micro``      — per-micro-batch progress rows (batchId, duration,
                   rows) from the query's recentProgress, printed for
                   the timed run

plus the total and the residual (force of the returned frame +
everything not wrapped).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

ACC: dict[str, list[float]] = defaultdict(lambda: [0.0, 0])


def wrap(cls, name: str, label: str | None = None) -> None:
    fn = getattr(cls, name)
    lab = label or f"{cls.__name__}.{name}"

    def inner(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.time() - t0
            ACC[lab][0] += dt
            ACC[lab][1] += 1

    setattr(cls, name, inner)


PROGRESS: list[dict] = []


def main() -> int:
    names = sys.argv[1:]
    import bench  # noqa: F401
    import __spark_entry__ as entry
    from aligned_spark.session import get_spark
    from aligned_spark.sources.delta_log import DeltaLog
    from aligned_spark.sources.iceberg_log import IcebergLog
    from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

    for m in ("write", "merge_upsert", "delete_where", "read_cdf"):
        if hasattr(DeltaLog, m):
            wrap(DeltaLog, m)
        if hasattr(IcebergLog, m):
            wrap(IcebergLog, m)
    wrap(DataStreamWriter, "start")
    wrap(StreamingQuery, "stop")
    wrap(StreamingQuery, "awaitTermination")

    orig_paa = StreamingQuery.processAllAvailable

    def paa(self):
        t0 = time.time()
        try:
            return orig_paa(self)
        finally:
            ACC["processAllAvailable"][0] += time.time() - t0
            ACC["processAllAvailable"][1] += 1
            try:
                PROGRESS.extend(
                    json.loads(p) if isinstance(p, str) else p
                    for p in self.recentProgress
                )
            except Exception:
                pass

    StreamingQuery.processAllAvailable = paa

    spark = get_spark("profile_stream")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    qs = entry.queries()

    def force(df):
        df.selectExpr("sum(xxhash64(struct(*)))").collect()

    for name in names:
        fn = qs[name]
        force(fn(spark, sf_dir))  # warm-up
        spark.catalog.clearCache()
        ACC.clear()
        PROGRESS.clear()
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        force(df)
        total = time.time() - t0
        print(f"\n=== {name}: total {total:.2f}s "
              f"(to-DataFrame {t_build:.2f}s) ===")
        for lab, (sec, cnt) in sorted(
            ACC.items(), key=lambda kv: -kv[1][0]
        ):
            print(f"  {lab:45s} {sec:7.3f}s  x{cnt}")
        for p in PROGRESS:
            d = p.get("durationMs") or {}
            print(
                f"  micro-batch {p.get('batchId')}: "
                f"rows={p.get('numInputRows')} "
                f"triggerExecution={d.get('triggerExecution')}ms "
                f"addBatch={d.get('addBatch')}ms "
                f"latestOffset={d.get('latestOffset')}ms "
                f"queryPlanning={d.get('queryPlanning')}ms "
                f"walCommit={d.get('walCommit')}ms "
                f"commitOffsets={d.get('commitOffsets')}ms "
                f"getBatch={d.get('getBatch')}ms"
            )
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
