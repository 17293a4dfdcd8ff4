"""Source abstraction.

Reference: ``BatchDataSource`` (``aligned/data_source/batch_data_source.py:136-344``)
with ``all_data`` / ``all_between_dates`` / ``features_for`` /
``freshness`` / ``depends_on``; ``WritableFeatureSource`` insert/
upsert/overwrite (``aligned/feature_source.py``).

Here a source produces a *DataFrame* (itself a lazy plan), so the
job-wrapper layer of the reference collapses: ``all_data`` ≈
``spark.read.X``, the date-range job is a filter Catalyst pushes into
the scan, and ``features_for`` is the PIT join operator applied to the
scanned frame.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchSource:
    """Base connector; subclasses implement :meth:`read`."""

    #: sources sharing a group key can be served by one scan
    def job_group_key(self) -> str:
        return repr(self)

    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    # -- the reference's job surface ------------------------------------
    def all_data(
        self, spark: SparkSession, columns: list[str] | None = None, limit: int | None = None
    ) -> DataFrame:
        df = self.read(spark)
        if columns:
            present = [c for c in columns if c in df.columns]
            df = df.select(*present)
        if limit is not None:
            df = df.limit(limit)
        return df

    def all_between_dates(
        self,
        spark: SparkSession,
        event_timestamp: str,
        start: dt.datetime,
        end: dt.datetime,
        columns: list[str] | None = None,
    ) -> DataFrame:
        df = self.all_data(spark, columns)
        return df.filter(
            (F.col(event_timestamp) >= F.lit(start))
            & (F.col(event_timestamp) <= F.lit(end))
        )

    def freshness(self, spark: SparkSession, event_timestamp: str) -> dt.datetime | None:
        """max(event_ts) (``batch_data_source.py:294-307``)."""
        row = self.read(spark).agg(F.max(event_timestamp).alias("m")).collect()[0]
        return row["m"]

    def depends_on(self) -> set[str]:
        return set()


class WritableSource(BatchSource):
    def insert(self, df: DataFrame) -> None:
        """Append rows."""
        raise NotImplementedError

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Entity-key dedupe, new rows win (``upsert_on_column``,
        ``aligned/data_file.py:7-22``)."""
        raise NotImplementedError

    def overwrite(self, df: DataFrame, predicate: Any | None = None) -> None:
        """Replace all data, or only rows matching ``predicate``."""
        raise NotImplementedError

    def delete_where(self, spark: SparkSession, predicate: Any) -> None:
        """Keep rows NOT matching predicate (``local.py:259-267``)."""
        raise NotImplementedError
