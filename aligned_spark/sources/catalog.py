"""Catalog-table and raw-SQL sources (reference Databricks Unity
Catalog connectors: ``UCTableSource`` ``aligned/sources/databricks.py:908``,
``UCSqlSource`` ``databricks.py:453`` — already near-1:1 Spark)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.sources.base import WritableSource, BatchSource


@dataclass
class TableSource(WritableSource):
    """A table registered in the Spark catalog (Hive metastore / Unity
    Catalog / temp view)."""

    identifier: str

    def job_group_key(self) -> str:
        return f"table:{self.identifier}"

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.identifier)

    def insert(self, df: DataFrame) -> None:
        df.write.mode("append").saveAsTable(self.identifier)

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        spark = df.sparkSession
        if not spark.catalog.tableExists(self.identifier):
            self.insert(df)
            return
        current = spark.table(self.identifier)
        kept = current.join(df.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(df, allowMissingColumns=True)
        # Spark refuses to overwrite a table its own plan reads
        # (UNSUPPORTED_OVERWRITE); checkpoint cuts the lineage. On a
        # real lakehouse use Delta/Iceberg MERGE instead — this
        # read-modify-write is the plain-catalog fallback.
        merged.localCheckpoint(eager=True).write.mode("overwrite").saveAsTable(
            self.identifier
        )

    def overwrite(self, df: DataFrame, predicate=None) -> None:
        spark = df.sparkSession
        if predicate is not None and spark.catalog.tableExists(self.identifier):
            current = spark.table(self.identifier).filter(~predicate)
            df = current.unionByName(df, allowMissingColumns=True)
            df = df.localCheckpoint(eager=True)
        df.write.mode("overwrite").saveAsTable(self.identifier)

    def freshness(self, spark: SparkSession, event_timestamp: str):
        # SELECT MAX(ts) (reference `databricks.py:1009-1022`)
        row = (
            spark.table(self.identifier)
            .agg(F.max(event_timestamp).alias("m"))
            .collect()[0]
        )
        return row["m"]


@dataclass
class BucketedTableSource(TableSource):
    """A catalog table bucketed (and sorted) on join/aggregation keys.

    Bucketing is the 100-TB co-location primitive: two tables bucketed
    on the same keys with the same bucket count join WITHOUT any
    Exchange — the shuffle happened once at write time and is
    amortized over every subsequent join/aggregation. Verified by
    ``tests/test_plan_properties.py::test_bucketed_join_has_no_exchange``.

    The reference has no analogue (single-node Polars); this maps its
    "partitioned source" intent onto Spark's physical layout control.
    """

    bucket_cols: list[str] | None = None
    num_buckets: int = 32
    sort_cols: list[str] | None = None

    def _writer(self, df: DataFrame, mode: str):
        cols = self.bucket_cols or []
        if not cols:
            raise ValueError("BucketedTableSource needs bucket_cols")
        w = df.write.mode(mode).bucketBy(self.num_buckets, *cols)
        return w.sortBy(*(self.sort_cols or cols))

    def insert(self, df: DataFrame) -> None:
        self._writer(df, "append").saveAsTable(self.identifier)

    def overwrite(self, df: DataFrame, predicate=None) -> None:
        spark = df.sparkSession
        if predicate is not None and spark.catalog.tableExists(self.identifier):
            current = spark.table(self.identifier).filter(~predicate)
            df = current.unionByName(df, allowMissingColumns=True)
            df = df.localCheckpoint(eager=True)
        self._writer(df, "overwrite").saveAsTable(self.identifier)

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        spark = df.sparkSession
        if not spark.catalog.tableExists(self.identifier):
            self.insert(df)
            return
        current = spark.table(self.identifier)
        kept = current.join(df.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(df, allowMissingColumns=True)
        self._writer(
            merged.localCheckpoint(eager=True), "overwrite"
        ).saveAsTable(self.identifier)


@dataclass
class SqlSource(BatchSource):
    """An arbitrary SQL query as a source."""

    query: str

    def job_group_key(self) -> str:
        return f"sql:{hash(self.query)}"

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.sql(self.query)
