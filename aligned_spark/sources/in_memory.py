"""In-memory literal source (reference ``InMemorySource``
``aligned/sources/in_mem_source.py:61``; ``RetrievalJob.from_dict``
``aligned/retrieval_job.py:1194-1315``)."""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource


class InMemorySource(WritableSource):
    def __init__(self, data: Any = None, schema: Any = None):
        """``data``: list[dict], dict[col → list], pandas DataFrame, or
        an existing Spark DataFrame."""
        self.data = data
        self.schema = schema
        self._df: DataFrame | None = data if isinstance(data, DataFrame) else None

    @staticmethod
    def from_dict(data: Mapping[str, Sequence], schema: Any = None) -> "InMemorySource":
        rows = [dict(zip(data.keys(), values)) for values in zip(*data.values())]
        return InMemorySource(rows, schema)

    def job_group_key(self) -> str:
        return f"in_memory:{id(self)}"

    def read(self, spark: SparkSession) -> DataFrame:
        if self._df is not None:
            return self._df
        if self.schema is not None:
            return spark.createDataFrame(self.data, schema=self.schema)
        return spark.createDataFrame(self.data)

    def insert(self, df: DataFrame) -> None:
        if self._df is None:
            self._df = df
        else:
            self._df = self._df.unionByName(df, allowMissingColumns=True)
        self.data = None

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        if self._df is None:
            self._df = df
            return
        kept = self._df.join(df.select(*keys).distinct(), on=keys, how="left_anti")
        self._df = kept.unionByName(df, allowMissingColumns=True)

    def overwrite(self, df: DataFrame, predicate: Any | None = None) -> None:
        if predicate is not None and self._df is not None:
            kept = self._df.filter(~predicate)
            self._df = kept.unionByName(df, allowMissingColumns=True)
        else:
            self._df = df
