"""SparkSession factory with scale-aware defaults.

Defaults target correctness-on-local + good behavior at cluster
scale: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), UTC session timezone (parity with the oracle and with
the reference's tz-naive-UTC convention), Arrow enabled for the
Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aligned_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster leave it unset and let spark-submit decide.
    ``shuffle_partitions`` defaults to the core count locally — at
    100 TB this must be sized so post-shuffle partitions are
    ~100-200 MB; AQE coalescing makes the exact number forgiving.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Permissive (Spark-3-style) semantics: invalid cast → null,
        # div-by-zero → null. Matches the reference's Polars non-strict
        # coercion (ToNumerical: invalid → null) and means one malformed
        # row can't kill a 100 TB job. ANSI-sensitive spots also use
        # try_* explicitly so the engine is correct under either setting.
        .config("spark.sql.ansi.enabled", "false")
        # pandas/pyarrow writers emit TIMESTAMP(NANOS) parquet, which
        # Spark otherwise refuses to scan (PARQUET_TYPE_ILLEGAL). Read
        # them as long nanos; sources.file.read_parquet casts back to
        # timestamp (micros, truncating — matches DuckDB/most engines).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet otherwise
        # infers TIMESTAMP_NTZ (rejected by unix_micros/window);
        # with the pinned-UTC session the LTZ reading is identical
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # write MICROS, not the deprecated INT96: INT96 pages carry NO
        # footer statistics, which would silently disable the Delta
        # log's timestamp data skipping (all_between_dates)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "90g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
