"""File-based sources: parquet, hive-partitioned parquet, CSV, JSON.

Reference: ``CsvFileSource`` (``aligned/sources/local.py:207``),
``ParquetFileSource`` (``local.py:730``),
``PartitionedParquetFileSource`` (``local.py:502``). S3/Azure variants
(``aligned/sources/s3.py``, ``azure_blob_storage.py``) are the same
readers pointed at ``s3a://`` / ``abfss://`` URIs — Spark's Hadoop
filesystem layer makes them path-schemes, not separate connectors.

Write semantics (``WritableSource``): parquet-backed upsert rewrites
the table via anti-join + union (no Delta in this container; with
Delta use :class:`aligned_spark.sources.delta.DeltaSource` whose
upsert is a real ``MERGE``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aligned_spark.sources.base import WritableSource


def ensure_engine_confs(spark: SparkSession) -> None:
    """Runtime-settable session confs the engine's semantics assume —
    safe to re-apply on sessions not built by ``get_spark``."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) otherwise
        # infers TIMESTAMP_NTZ, which unix_micros()/window() reject;
        # with a pinned-UTC session the LTZ reading is value-identical
        # and matches DuckDB's naive-timestamp view of the same files
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf locked down (e.g. shared cluster) — proceed


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — read the footer of
    one file driver-side (cheap: metadata only, no data scan)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(path):
        candidates = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not candidates:
            return []
        p = os.path.join(path, candidates[0])
    try:
        schema = pq.read_schema(p)
    except Exception:
        return []
    return [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan robust to TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type and refuses NANOS parquet
    columns outright unless ``spark.sql.legacy.parquet.nanosAsLong``
    is set (it is, in :func:`aligned_spark.session.get_spark`). Those
    columns arrive as long nanos; we cast back to a proper timestamp
    truncated to micros (integer ``div`` — a double roundtrip would
    lose sub-µs precision), which is exactly what DuckDB/Polars do
    when reading the same files.

    The confs are (re)asserted here at runtime: callers may hand us a
    session built without :func:`aligned_spark.session.get_spark`
    (e.g. an external harness). NANOS scans hard-fail without the
    legacy conf; UTC + non-ANSI are this engine's documented semantics
    (SURVEY §1.2: tz-naive-UTC timestamps, invalid cast → null)."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(path)
    for c in _nano_timestamp_columns(path):
        # footer inspection reads ONE file; a directory can mix
        # pandas-written (NANOS -> long) and Spark-written (micros ->
        # timestamp) parts, so only cast when the scan actually
        # surfaced the column as long nanos
        if isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(
                c, F.expr(f"timestamp_micros(`{c}` div 1000)")
            )
    # inferTimestampNTZ=false is asserted above, but the conf is
    # ignored on sessions whose reader was already resolved (or locked
    # down); engine semantics are tz-naive-UTC on TIMESTAMP, so fold
    # any NTZ survivor into the pinned-UTC session type explicitly
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    if ntz:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz}
        )
    return df


@dataclass
class _FileSource(WritableSource):
    path: str
    mapping_keys: dict[str, str] = field(default_factory=dict)
    #: read options passed to the reader
    options: dict[str, str] = field(default_factory=dict)

    format: str = "parquet"

    def job_group_key(self) -> str:
        return f"{self.format}:{self.path}"

    def _reader(self, spark: SparkSession):
        return spark.read.options(**self.options).format(self.format)

    def read(self, spark: SparkSession) -> DataFrame:
        df = self._reader(spark).load(self.path)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    # -- writes ---------------------------------------------------------
    def insert(self, df: DataFrame) -> None:
        df.write.format(self.format).options(**self.options).mode("append").save(
            self.path
        )

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        spark = df.sparkSession
        if predicate is not None and os.path.exists(self.path):
            current = self.read(spark).filter(~predicate)
            df = current.unionByName(df, allowMissingColumns=True)
        # two-phase write: stage then swap, so the scan never reads a
        # half-written table (single-writer local semantics; Delta/
        # Iceberg give this transactionally on a cluster)
        staging = f"{self.path}__staging"
        df.write.format(self.format).options(**self.options).mode("overwrite").save(
            staging
        )
        final = spark.read.options(**self.options).format(self.format).load(staging)
        final.write.format(self.format).options(**self.options).mode(
            "overwrite"
        ).save(self.path)

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        spark = df.sparkSession
        if not os.path.exists(self.path):
            self.insert(df)
            return
        current = self.read(spark)
        kept = current.join(df.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(df, allowMissingColumns=True)
        self.overwrite(merged)

    def delete_where(self, spark: SparkSession, predicate: Column) -> None:
        remaining = self.read(spark).filter(~predicate)
        self.overwrite(remaining)


@dataclass
class ParquetSource(_FileSource):
    format: str = "parquet"

    def read(self, spark: SparkSession) -> DataFrame:
        df = read_parquet(spark, self.path)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df


@dataclass
class PartitionedParquetSource(_FileSource):
    """Hive-partitioned parquet (``local.py:502``): partition discovery
    is native on read; writes route through ``partitionBy`` so
    partition pruning works downstream."""

    format: str = "parquet"
    partition_keys: list[str] = field(default_factory=list)

    def insert(self, df: DataFrame) -> None:
        df.write.partitionBy(*self.partition_keys).mode("append").parquet(self.path)

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        spark = df.sparkSession
        if predicate is not None and os.path.exists(self.path):
            current = self.read(spark).filter(~predicate)
            df = current.unionByName(df, allowMissingColumns=True)
        staging = f"{self.path}__staging"
        df.write.partitionBy(*self.partition_keys).mode("overwrite").parquet(staging)
        final = spark.read.parquet(staging)
        final.write.partitionBy(*self.partition_keys).mode("overwrite").parquet(
            self.path
        )

    def overwrite_partitions(self, df: DataFrame) -> None:
        """Dynamic partition overwrite: replace ONLY the hive
        partitions present in ``df``, leaving every other partition's
        files untouched. This is the 100 TB incremental-refresh write
        path — a day's re-materialization rewrites that day's
        partitions, not the table (contrast :meth:`overwrite`, whose
        predicate form re-stages everything). ``df`` must contain ALL
        rows for each partition it touches (partition replacement is
        whole-partition)."""
        (
            df.write.partitionBy(*self.partition_keys)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(self.path)
        )


@dataclass
class CsvSource(_FileSource):
    format: str = "csv"
    delimiter: str = ","
    has_header: bool = True

    def _reader(self, spark: SparkSession):
        return (
            spark.read.options(**self.options)
            .option("header", str(self.has_header).lower())
            .option("sep", self.delimiter)
            .option("inferSchema", "true")
            .format("csv")
        )

    def insert(self, df: DataFrame) -> None:
        df.write.option("header", str(self.has_header).lower()).option(
            "sep", self.delimiter
        ).mode("append").csv(self.path)


@dataclass
class JsonSource(_FileSource):
    format: str = "json"


@dataclass
class OrcSource(_FileSource):
    """ORC files — same columnar pushdown contract as parquet
    (predicate + projection reach the stripe reader)."""

    format: str = "orc"


class FileSource:
    """Convenience factory namespace (reference ``FileSource``)."""

    @staticmethod
    def parquet(path: str, mapping_keys: dict[str, str] | None = None) -> ParquetSource:
        return ParquetSource(path=path, mapping_keys=mapping_keys or {})

    @staticmethod
    def partitioned_parquet(
        path: str,
        partition_keys: list[str],
        mapping_keys: dict[str, str] | None = None,
    ) -> PartitionedParquetSource:
        return PartitionedParquetSource(
            path=path,
            partition_keys=partition_keys,
            mapping_keys=mapping_keys or {},
        )

    @staticmethod
    def csv(
        path: str,
        delimiter: str = ",",
        mapping_keys: dict[str, str] | None = None,
    ) -> CsvSource:
        return CsvSource(
            path=path, delimiter=delimiter, mapping_keys=mapping_keys or {}
        )

    @staticmethod
    def json(path: str, mapping_keys: dict[str, str] | None = None) -> JsonSource:
        return JsonSource(path=path, mapping_keys=mapping_keys or {})

    @staticmethod
    def orc(path: str, mapping_keys: dict[str, str] | None = None) -> OrcSource:
        return OrcSource(path=path, mapping_keys=mapping_keys or {})

    @staticmethod
    def delta(path: str):
        from aligned_spark.sources.delta import DeltaSource

        return DeltaSource(path=path)
