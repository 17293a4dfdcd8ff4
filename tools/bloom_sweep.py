"""Measure bloom-sidecar data skipping vs range-only stats on a
hash-keyed table (PERF.md evidence for the round-8/9 bloom work).

Layout under test: N parts of xxhash64 keys — every part's (min, max)
spans ~the whole int64 line, so footer-range skipping can never
prune; only the per-part bloom sidecars can. Measures, at each part
count:

- point lookup: files scanned + wall time, range-only vs range+bloom
  (present key and guaranteed miss);
- MERGE touched-file discovery (`_touched_files` via
  `_key_range_candidates`): candidate parts + discovery wall time
  with a 200-key single-part source, bloomed vs un-bloomed control.

Usage: python tools/bloom_sweep.py [rows] [parts...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from aligned_spark.session import get_spark  # noqa: E402
from aligned_spark.sources.delta_log import DeltaLog  # noqa: E402


def build(spark, rows: int, n_parts: int, bloom: bool) -> DeltaLog:
    tbl = tempfile.mkdtemp(prefix="bloom_sweep_")
    log = DeltaLog(os.path.join(tbl, "t"))
    df = (
        spark.range(rows)
        .select(F.xxhash64("id").alias("k"), F.col("id").alias("v"))
        .repartition(n_parts)
    )
    log.write(df)
    if bloom:
        log.set_bloom_filter(["k"], fpp=1e-6)
        log.optimize(spark)
    return log


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    part_counts = (
        [int(x) for x in sys.argv[2:]] if len(sys.argv) > 2 else [8, 40]
    )
    spark = get_spark("bloom_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"rows={rows}  (uniform xxhash64 keys; ranges never prune)\n"
    )
    print(
        f"{'parts':>5} {'mode':<12} {'lookup_files':>12} "
        f"{'lookup_s':>9} {'miss_files':>10} {'miss_s':>7} "
        f"{'merge_cands':>11} {'merge_disc_s':>12}"
    )
    for n_parts in part_counts:
        for bloom in (False, True):
            log = build(spark, rows, n_parts, bloom)
            snap = log.snapshot()
            key = log.read(spark).select("k").first()["k"]

            def lookup(k):
                df = log.read(spark, skipping=[("k", "=", k)])
                return len(df.inputFiles()), df.filter(
                    F.col("k") == k
                ).count()

            (hit_files, hit_n), t_hit = timed(lambda: lookup(key))
            assert hit_n >= 1
            (miss_files, miss_n), t_miss = timed(
                lambda: lookup(123_456_789)
            )
            assert miss_n == 0

            one = sorted(snap.files)[0]
            src = (
                spark.read.parquet(
                    os.path.join(log.table_path, one)
                )
                .select("k")
                .limit(200)
            )
            src.collect()  # materialize source cost out of the timing
            cands, t_disc = timed(
                lambda: log._key_range_candidates(snap, src, ["k"])
            )
            mode = "range+bloom" if bloom else "range-only"
            print(
                f"{n_parts:>5} {mode:<12} {hit_files:>12} "
                f"{t_hit:>9.3f} {miss_files:>10} {t_miss:>7.3f} "
                f"{len(cands):>11} {t_disc:>12.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
