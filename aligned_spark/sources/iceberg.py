"""Iceberg table source (reference ``IcebergTable``
``aligned/sources/iceberg.py:71``).

Spark-first: Iceberg is a catalog format — reads/writes go through
``spark.table`` / ``MERGE INTO`` with the iceberg-spark-runtime jars
and a configured catalog (e.g. ``spark.sql.catalog.<name>`` =
``org.apache.iceberg.spark.SparkCatalog``). The jars are NOT in this
container: constructing the source works everywhere; using it without
an Iceberg catalog raises a clear error.

Unlike the reference (pyiceberg on the driver, Arrow append/upsert
through a single process), every operation here is a distributed
Spark job — upsert is a real ``MERGE INTO`` handled by the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        # Class.forName throws when the jar is absent (plain jvm
        # attribute access returns a JavaPackage without checking)
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession) -> None:
    if not _has_iceberg(spark):
        raise RuntimeError(
            "Iceberg is not available: add the iceberg-spark-runtime jar "
            "and configure spark.sql.catalog.<catalog> = "
            "org.apache.iceberg.spark.SparkCatalog"
        )


@dataclass
class IcebergSource(WritableSource):
    """``catalog.schema.table`` Iceberg identifier."""

    table: str
    mapping_keys: dict[str, str] = field(default_factory=dict)

    def job_group_key(self) -> str:
        return f"iceberg:{self.table}"

    def read(self, spark: SparkSession) -> DataFrame:
        _require_iceberg(spark)
        df = spark.table(self.table)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def insert(self, df: DataFrame) -> None:
        _require_iceberg(df.sparkSession)
        df.writeTo(self.table).append()

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Distributed ``MERGE INTO`` on the entity keys (the
        reference's pyiceberg driver-side upsert, re-expressed as a
        cluster job)."""
        spark = df.sparkSession
        _require_iceberg(spark)
        df.createOrReplaceTempView("__iceberg_upsert_src")
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {self.table} t USING __iceberg_upsert_src s "
            f"ON {cond} WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        _require_iceberg(df.sparkSession)
        if predicate is not None:
            df.writeTo(self.table).overwrite(predicate)
        else:
            df.writeTo(self.table).replace()

    def delete_where(self, spark: SparkSession, predicate: Column) -> None:
        _require_iceberg(spark)
        spark.sql(f"DELETE FROM {self.table} WHERE {predicate._jc.toString()}")
