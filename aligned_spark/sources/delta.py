"""Delta Lake source (reference ``DeltaFileSource``
``aligned/sources/local.py:887``; Iceberg ``aligned/sources/iceberg.py:71``).

Delta is the intended primary storage at 100 TB: transactional
upsert (``MERGE``), data skipping, ``OPTIMIZE ZORDER BY (entity, ts)``
for PIT locality. The delta-spark jars are NOT in this container, so
the connector degrades gracefully: constructing it works, using it
without delta installed raises a clear error; when available, it uses
the real APIs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource

try:  # gated: delta-spark not in this container
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # pragma: no cover
    DeltaTable = None  # type: ignore
    HAS_DELTA = False


def _require_delta() -> None:
    if not HAS_DELTA:
        raise RuntimeError(
            "delta-spark is not installed; add the delta-spark package and "
            "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension"
        )


@dataclass
class DeltaSource(WritableSource):
    path: str
    mapping_keys: dict[str, str] = field(default_factory=dict)

    def job_group_key(self) -> str:
        return f"delta:{self.path}"

    def read(self, spark: SparkSession) -> DataFrame:
        _require_delta()
        df = spark.read.format("delta").load(self.path)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def insert(self, df: DataFrame) -> None:
        _require_delta()
        df.write.format("delta").mode("append").save(self.path)

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Real transactional merge — only touched files rewrite
        (reference's deltalake merge, ``local.py:663``)."""
        _require_delta()
        spark = df.sparkSession
        if not DeltaTable.isDeltaTable(spark, self.path):
            self.insert(df)
            return
        table = DeltaTable.forPath(spark, self.path)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        (
            table.alias("t")
            .merge(df.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        _require_delta()
        writer = df.write.format("delta").mode("overwrite")
        if predicate is not None:
            writer = writer.option("replaceWhere", str(predicate._jc))
        writer.save(self.path)

    def delete_where(self, spark: SparkSession, predicate: Column) -> None:
        _require_delta()
        DeltaTable.forPath(spark, self.path).delete(predicate)

    def optimize_zorder(self, spark: SparkSession, columns: list[str]) -> None:
        """Cluster files by (entity, ts) for PIT-join data skipping."""
        _require_delta()
        cols = ", ".join(f"`{c}`" for c in columns)
        spark.sql(f"OPTIMIZE delta.`{self.path}` ZORDER BY ({cols})")
