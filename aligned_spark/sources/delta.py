"""Delta Lake source (reference ``DeltaFileSource``
``aligned/sources/local.py:887``; Iceberg ``aligned/sources/iceberg.py:71``).

Delta is the intended primary storage at 100 TB: transactional
upsert (``MERGE``), data skipping, ``OPTIMIZE ZORDER BY (entity, ts)``
for PIT locality. When the delta-spark jars are present the real JVM
APIs are used; when they are NOT (this container), every operation
falls back to :mod:`aligned_spark.sources.delta_log` — a pure-Python
implementation of the public Delta transaction-log protocol over
local filesystems — so the table format is exercised end-to-end
either way. Concurrent writers are handled with the standard
optimistic retry loop around :class:`ConcurrentCommitError`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource
from aligned_spark.sources.delta_log import (
    ConcurrentCommitError,
    DeltaLog,
)

try:  # gated: delta-spark not in this container
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except Exception:  # pragma: no cover
    DeltaTable = None  # type: ignore
    HAS_DELTA = False

_MAX_COMMIT_RETRIES = 10


def _retrying(fn) -> Any:
    """Optimistic-concurrency loop: each attempt re-resolves against
    the latest snapshot (the callable re-reads it), so a lost race
    simply replays the logical operation."""
    for attempt in range(_MAX_COMMIT_RETRIES):
        try:
            return fn()
        except ConcurrentCommitError:
            if attempt == _MAX_COMMIT_RETRIES - 1:
                raise
    return None  # pragma: no cover


@dataclass
class DeltaSource(WritableSource):
    path: str
    mapping_keys: dict[str, str] = field(default_factory=dict)
    #: partition layout applied on first write
    partition_by: list[str] | None = None
    #: allow appends to ADD columns (schema evolution)
    merge_schema: bool = False
    #: commit-coordination backend override (e.g.
    #: :class:`~aligned_spark.sources.log_store.S3LogStore` for a
    #: conditional-put-coordinated log on an object store); None =
    #: filesystem exclusive-create under ``path/_delta_log``
    log_store: Any | None = None
    #: route upsert/delete through POSITION DELETES (merge-on-read,
    #: reader-feature-gated engine extension) instead of copy-on-write
    #: part rewrites — the small-frequent-change posture; compact
    #: with :meth:`optimize_zorder` / ``DeltaLog.optimize``
    merge_on_read: bool = False

    def job_group_key(self) -> str:
        return f"delta:{self.path}"

    def _log(self) -> DeltaLog:
        return DeltaLog(self.path, log_store=self.log_store)

    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            reader = spark.read.format("delta")
            if version is not None:
                reader = reader.option("versionAsOf", version)
            df = reader.load(self.path)
        else:
            df = self._log().read(spark, version=version)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def insert(self, df: DataFrame) -> None:
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            writer = df.write.format("delta").mode("append")
            if self.merge_schema:
                writer = writer.option("mergeSchema", "true")
            writer.save(self.path)
            return
        _retrying(
            lambda: self._log().write(
                df,
                "append",
                self.partition_by,
                merge_schema=self.merge_schema,
            )
        )

    def all_between_dates(
        self,
        spark: SparkSession,
        event_timestamp: str,
        start,
        end,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Date-range read with DATA SKIPPING: parquet-footer min/max
        stats (harvested at write time) prune whole parts before
        Spark lists a single file — the scan a freshness check or
        incremental materialization runs reads only the parts whose
        stats overlap [start, end]. Timestamps compare as ISO-8601
        strings, whose lexicographic order IS chronological order.
        The row-level filter still applies on top (skipping is sound,
        not complete)."""
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            return super().all_between_dates(
                spark, event_timestamp, start, end, columns
            )
        # mapping_keys renames physical → logical; skipping needs the
        # PHYSICAL column name the footers were written under
        physical = event_timestamp
        for raw, logical in self.mapping_keys.items():
            if logical == event_timestamp:
                physical = raw
                break

        def _iso(v):
            # footer stats are NAIVE-UTC ISO strings (parts._norm);
            # normalize tz-aware bounds the same way so the string
            # comparison stays chronological at equal instants
            import datetime as dt

            if isinstance(v, dt.datetime) and v.tzinfo is not None:
                v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
            return v.isoformat()

        df = self._log().read(
            spark,
            skipping=[
                (physical, ">=", _iso(start)),
                (physical, "<=", _iso(end)),
            ],
        )
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        if columns:
            present = [c for c in columns if c in df.columns]
            df = df.select(*present)
        from pyspark.sql import functions as F  # noqa: PLC0415

        return df.filter(
            (F.col(event_timestamp) >= F.lit(start))
            & (F.col(event_timestamp) <= F.lit(end))
        )

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Real transactional merge — only touched files rewrite
        (reference's deltalake merge, ``local.py:663``)."""
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
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
            return
        if self.merge_on_read:
            _retrying(
                lambda: self._log().merge_upsert_mor(
                    df, keys, self.partition_by
                )
            )
        else:
            _retrying(
                lambda: self._log().merge_upsert(
                    df,
                    keys,
                    self.partition_by,
                    merge_schema=self.merge_schema,
                )
            )

    def overwrite(self, df: DataFrame, predicate: Column | None = None) -> None:
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            writer = df.write.format("delta").mode("overwrite")
            if predicate is not None:
                writer = writer.option("replaceWhere", str(predicate._jc))
            writer.save(self.path)
            return
        if predicate is not None:
            _retrying(
                lambda: self._log().replace_where(df, predicate)
            )
            return
        _retrying(
            lambda: self._log().write(df, "overwrite", self.partition_by)
        )

    def delete_where(self, spark: SparkSession, predicate: Column) -> None:
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            DeltaTable.forPath(spark, self.path).delete(predicate)
            return
        if self.merge_on_read:
            _retrying(
                lambda: self._log().delete_where_mor(spark, predicate)
            )
        else:
            _retrying(
                lambda: self._log().delete_where(spark, predicate)
            )

    def version(self, spark: SparkSession | None = None) -> int:
        """Current table version — the cursor an incremental consumer
        records before calling :meth:`read_changes`."""
        return self._log().latest_version()

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Exactly-once change feed (``_change_type`` +
        ``_commit_version``) since ``from_version`` — MERGE/DELETE
        rewrites emit only the truly-changed rows, never their
        surviving co-residents (:meth:`DeltaLog.read_cdf`). Works on
        jar-written tables too: the reconstruction reads the public
        commit JSON, no table property required."""
        df = self._log().read_cdf(spark, from_version, to_version)
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def restore(self, spark: SparkSession, version: int) -> None:
        """RESTORE TABLE ... TO VERSION AS OF (metadata-only
        rollback; history preserved)."""
        _retrying(lambda: self._log().restore(version))

    def detail(self, spark: SparkSession | None = None) -> dict:
        """DESCRIBE DETAIL: file/row/byte/delete counts from
        metadata alone."""
        return self._log().detail()

    def maybe_optimize(self, spark: SparkSession, **thresholds) -> bool:
        """Compact iff merge-on-read state crosses the policy
        thresholds (metadata-only decision) — the post-ingest hook;
        see :meth:`DeltaLog.should_compact`."""
        return self._log().maybe_optimize(spark, **thresholds)

    def optimize_zorder(self, spark: SparkSession, columns: list[str]) -> None:
        """Cluster files by (entity, ts) for PIT-join data skipping."""
        if HAS_DELTA and self.log_store is None and not self.merge_on_read:
            cols = ", ".join(f"`{c}`" for c in columns)
            spark.sql(
                f"OPTIMIZE delta.`{self.path}` ZORDER BY ({cols})"
            )
            return
        _retrying(
            lambda: self._log().optimize(spark, zorder_by=columns)
        )
