"""Iceberg table source (reference ``IcebergTable``
``aligned/sources/iceberg.py:71``).

Spark-first: Iceberg is a catalog format — reads/writes go through
``spark.table`` / ``MERGE INTO`` with the iceberg-spark-runtime jars
and a configured catalog (e.g. ``spark.sql.catalog.<name>`` =
``org.apache.iceberg.spark.SparkCatalog``). The jars are NOT in this
container, so when they are absent every operation falls back to
:mod:`aligned_spark.sources.iceberg_log` — a pure-Python v1 table
format implementation (JSON metadata versions + REAL Avro manifest
lists/manifests via :mod:`aligned_spark.sources.avro_io`) rooted at
``path`` — with the standard optimistic retry around concurrent
metadata commits. Catalog-identifier-only sources without a ``path``
still raise the clear jar-gating error.

Unlike the reference (pyiceberg on the driver, Arrow append/upsert
through a single process), every operation here is a distributed
Spark job — upsert is a real ``MERGE INTO`` handled by the cluster
(jar path) or a file-pruned copy-on-write rewrite (pure-Python path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.sources.base import WritableSource
from aligned_spark.sources.delta import _retrying
from aligned_spark.sources.iceberg_log import IcebergLog


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
    """``catalog.schema.table`` Iceberg identifier (jar path), or a
    filesystem ``path`` for the pure-Python v1 implementation."""

    table: str = ""
    mapping_keys: dict[str, str] = field(default_factory=dict)
    #: table directory for the jar-free path (HadoopCatalog-style)
    path: str | None = None
    partition_by: list[str] | None = None
    #: allow appends to ADD columns (schema evolution)
    merge_schema: bool = False
    #: commit-coordination backend for the version files (e.g.
    #: :class:`~aligned_spark.sources.log_store.S3LogStore`); None =
    #: filesystem exclusive-create under ``path/metadata``
    commit_store: Any | None = None
    #: route upsert/delete through v2 POSITION DELETES
    #: (merge-on-read) instead of copy-on-write part rewrites — the
    #: small-frequent-change posture; compact with
    #: :meth:`optimize_zorder` / ``IcebergLog.optimize``
    merge_on_read: bool = False

    def job_group_key(self) -> str:
        return f"iceberg:{self.table or self.path}"

    def _use_jars(self, spark: SparkSession) -> bool:
        if self.table and _has_iceberg(spark) and self.commit_store is None:
            return True
        if self.path is None:
            _require_iceberg(spark)  # raises the clear gating error
        return False

    def _log(self) -> IcebergLog:
        return IcebergLog(self.path, commit_store=self.commit_store)

    def read(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        if self._use_jars(spark):
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", snapshot_id)
            df = (
                reader.load(self.table)
                if snapshot_id is not None
                else spark.table(self.table)
            )
        else:
            df = self._log().read(spark, snapshot_id=snapshot_id)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def all_between_dates(
        self,
        spark: SparkSession,
        event_timestamp: str,
        start,
        end,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Date-range read with DATA SKIPPING: manifest-entry
        ``lower_bounds``/``upper_bounds`` (spec fields, harvested
        from parquet footers at write time) prune whole parts before
        Spark lists a file — the Iceberg twin of
        :meth:`DeltaSource.all_between_dates`. Bounds decode to
        naive-UTC datetimes, so the predicate values are normalized
        the same way; the row-level filter still applies on top
        (skipping is sound, not complete)."""
        if self._use_jars(spark):
            return super().all_between_dates(
                spark, event_timestamp, start, end, columns
            )
        physical = event_timestamp
        for raw, logical in self.mapping_keys.items():
            if logical == event_timestamp:
                physical = raw
                break

        def _naive(v):
            import datetime as dt

            if isinstance(v, dt.datetime) and v.tzinfo is not None:
                return v.astimezone(dt.timezone.utc).replace(
                    tzinfo=None
                )
            return v

        df = self._log().read(
            spark,
            skipping=[
                (physical, ">=", _naive(start)),
                (physical, "<=", _naive(end)),
            ],
        )
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        if columns:
            present = [c for c in columns if c in df.columns]
            df = df.select(*present)
        return df.filter(
            (F.col(event_timestamp) >= F.lit(start))
            & (F.col(event_timestamp) <= F.lit(end))
        )

    def insert(self, df: DataFrame) -> None:
        if self._use_jars(df.sparkSession):
            df.writeTo(self.table).append()
            return
        _retrying(
            lambda: self._log().write(
                df,
                "append",
                self.partition_by,
                merge_schema=self.merge_schema,
            )
        )

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Distributed ``MERGE INTO`` on the entity keys (the
        reference's pyiceberg driver-side upsert, re-expressed as a
        cluster job), or the jar-free file-pruned copy-on-write
        MERGE."""
        spark = df.sparkSession
        if self._use_jars(spark):
            df.createOrReplaceTempView("__iceberg_upsert_src")
            cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            spark.sql(
                f"MERGE INTO {self.table} t USING __iceberg_upsert_src s "
                f"ON {cond} WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
            return
        if self.merge_on_read:
            _retrying(lambda: self._log().merge_upsert_mor(df, keys))
        else:
            _retrying(
                lambda: self._log().merge_upsert(
                    df, keys, merge_schema=self.merge_schema
                )
            )

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        if self._use_jars(df.sparkSession):
            if predicate is not None:
                df.writeTo(self.table).overwrite(predicate)
            else:
                df.writeTo(self.table).replace()
            return
        if predicate is not None:
            _retrying(
                lambda: self._log().replace_where(df, predicate)
            )
            return
        _retrying(
            lambda: self._log().write(
                df,
                "overwrite",
                self.partition_by,
                merge_schema=self.merge_schema,
            )
        )

    def version(self, spark: SparkSession | None = None) -> int:
        """Current snapshot id — the cursor an incremental consumer
        records before calling :meth:`read_changes`."""
        ids = self._log().snapshot_ids()
        return ids[-1] if ids else -1

    def sequence_numbers(self) -> dict[int, int]:
        """``snapshot_id -> sequence-number``: the monotone commit
        order random snapshot ids lack — what continuous IVM keys
        its exactly-once cursor on (:meth:`IcebergLog.
        sequence_numbers`)."""
        return self._log().sequence_numbers()

    def read_changes(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Exactly-once change feed (``_change_type`` +
        ``_snapshot_id``) — the Iceberg twin of
        :meth:`DeltaSource.read_changes`."""
        df = self._log().read_changes(
            spark, from_snapshot_id, to_snapshot_id
        )
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def delete_where(self, spark: SparkSession, predicate: Column) -> None:
        if self._use_jars(spark):
            spark.sql(
                f"DELETE FROM {self.table} "
                f"WHERE {predicate._jc.toString()}"
            )
            return
        if self.merge_on_read:
            _retrying(
                lambda: self._log().delete_where_mor(spark, predicate)
            )
        else:
            _retrying(
                lambda: self._log().delete_where(spark, predicate)
            )

    def rollback_to(
        self, spark: SparkSession, snapshot_id: int
    ) -> None:
        """Roll the table pointer back to an existing snapshot."""
        _retrying(lambda: self._log().rollback_to(snapshot_id))

    def detail(self, spark: SparkSession | None = None) -> dict:
        """DESCRIBE DETAIL: file/row/byte/delete counts from
        manifests alone."""
        return self._log().detail()

    def maybe_optimize(self, spark: SparkSession, **thresholds) -> bool:
        """Compact iff merge-on-read state crosses the policy
        thresholds (metadata-only decision) — the post-ingest hook;
        see :meth:`IcebergLog.should_compact`."""
        return self._log().maybe_optimize(spark, **thresholds)

    def optimize_zorder(
        self, spark: SparkSession, columns: list[str]
    ) -> None:
        """Compact + cluster files by (entity, ts) for PIT-join data
        skipping — Iceberg ``rewriteDataFiles`` with a z-order
        strategy; jar path uses the system procedure."""
        if self._use_jars(spark):
            cols = ", ".join(f"'{c}'" for c in columns)
            spark.sql(
                f"CALL system.rewrite_data_files(table => "
                f"'{self.table}', strategy => 'sort', sort_order => "
                f"'zorder({cols})')"
            )
            return
        _retrying(
            lambda: self._log().optimize(spark, zorder_by=columns)
        )
