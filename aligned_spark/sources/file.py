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

from aligned_spark.sources.base import WritableSource


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
    def delta(path: str):
        from aligned_spark.sources.delta import DeltaSource

        return DeltaSource(path=path)
