"""Native Spark streaming source over the engine's pure-Python Delta
and Iceberg tables (PySpark Python Data Source API).

``spark.readStream.format("aligned_table")`` tails a table's commit
log with version-based offsets — the same role delta-spark's
streaming source / Iceberg's streaming read play (reference ingest
loop: ``aligned/worker.py:150-242`` polls a source and feeds the
contract pipeline; here the poll loop IS Structured Streaming's
trigger machinery, so checkpointing, exactly-once replay, watermarks
and every downstream streaming operator come for free).

Scale design:
- **Offsets are log versions, not row positions.** ``latestOffset``
  and ``partitions`` are driver-side metadata reads (a handful of
  JSON/Avro files per trigger); no data is touched until executors
  read their assigned parts.
- **One input partition per parquet part** — reads parallelize
  across the cluster exactly like a batch scan of the same files,
  and a 100-file commit becomes a 100-task micro-batch.
- **Replay-deterministic**: the commit log is immutable, so
  ``partitions(start, end)`` always plans the same file set — a
  recovered query re-reads exactly the rows of the failed batch
  (exactly-once with the engine's idempotent sinks,
  ``streaming/sinks.py``).
- **Admission control**: ``max_files_per_trigger`` caps each
  micro-batch at version granularity (≥1 version per trigger so the
  stream always advances).

Semantics match delta-spark's streaming source: append commits only;
a commit that removes or rewrites live rows (MERGE/DELETE/UPDATE,
copy-on-write or merge-on-read) raises unless ``ignoreChanges`` is
set, in which case its re-added rows are emitted (consumers dedup on
keys — documented delta behavior). Compaction commits
(``dataChange=false`` / Iceberg ``replace``) are invisible, as they
change no rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "aligned_table"


@dataclass
class _PartFile(InputPartition):
    """One parquet part of a micro-batch. ``partition_values`` carries
    hive partition-column values (absent from the file itself);
    ``schema_json`` is the stream's output StructType."""

    abs_path: str
    partition_values: dict[str, Any]
    schema_json: str


def _delta_log(path: str):
    from aligned_spark.sources.delta_log import DeltaLog

    return DeltaLog(path)


def _iceberg_log(path: str):
    from aligned_spark.sources.iceberg_log import IcebergLog

    return IcebergLog(path)


def _align_batches(
    abs_path: str,
    partition_values: dict[str, Any],
    schema_json: str,
) -> Iterator[Any]:
    """Executor-side: stream a parquet part as arrow batches aligned
    to the table schema — missing (schema-evolved) columns project
    null, partition columns materialize from the log's metadata, and
    everything casts to the exact arrow types Spark expects."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(json.loads(schema_json))
    target = to_arrow_schema(spark_schema)

    pf = pq.ParquetFile(abs_path)
    present = set(pf.schema_arrow.names)
    read_cols = [n for n in target.names if n in present]
    for rb in pf.iter_batches(columns=read_cols):
        n = rb.num_rows
        tbl = pa.Table.from_batches([rb])
        arrays = []
        for field in target:
            if field.name in present:
                arr = tbl.column(field.name)
                if arr.type != field.type:
                    arr = pc.cast(arr, field.type)
            elif field.name in partition_values:
                v = partition_values[field.name]
                if v is None:
                    arr = pa.nulls(n, field.type)
                else:
                    # delta partitionValues are hive strings; iceberg
                    # manifest values are native — cast handles both
                    arr = pc.cast(pa.array([v] * n), field.type)
            else:
                arr = pa.nulls(n, field.type)
            arrays.append(arr)
        out = pa.Table.from_arrays(arrays, schema=target)
        yield from out.to_batches()


class _DeltaStreamReader(DataSourceStreamReader):
    """Offsets: ``{"version": v}`` — last commit version PLANNED
    (inclusive). All methods here run driver-side; only
    :meth:`read` runs on executors."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        self._path = options["path"]
        self._schema_json = schema.json()
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        mft = options.get("maxfilespertrigger")
        self._max_files = int(mft) if mft else None
        self._starting = options.get("startingversion", "0")
        self._last_end: int | None = None

    # -------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        log = _delta_log(self._path)
        if str(self._starting).lower() == "latest":
            return {"version": log.latest_version()}
        return {"version": int(self._starting) - 1}

    def latestOffset(self) -> dict:
        log = _delta_log(self._path)
        latest = log.latest_version()
        if self._max_files is not None and self._last_end is not None:
            v, budget = self._last_end, self._max_files
            while v < latest:
                n_files = len(self._commit_adds(log, v + 1)[0])
                if n_files > budget and v > self._last_end:
                    break
                budget -= n_files
                v += 1
            latest = v
        self._last_end = latest
        return {"version": latest}

    # -------------------------------------------------- planning
    def _commit_adds(
        self, log: Any, version: int
    ) -> tuple[list[dict[str, Any]], bool]:
        """(dataChange add actions, commit-rewrites-live-rows)."""
        adds: list[dict[str, Any]] = []
        changes = False
        for action in log._read_commit(version):
            add = action.get("add")
            if add is not None and add.get("dataChange", True):
                adds.append(add)
            rm = action.get("remove")
            if rm is not None and rm.get("dataChange", True):
                changes = True
            dl = action.get("deleteFile")
            if dl is not None and dl.get("add", True):
                # new MOR position-delete sidecar = row-level deletes
                changes = True
        return adds, changes

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        log = _delta_log(self._path)
        self._last_end = int(end["version"])
        parts: list[InputPartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            adds, changes = self._commit_adds(log, v)
            if changes and not self._ignore_changes:
                raise ValueError(
                    f"Delta commit {v} of {self._path} updates or "
                    "deletes existing rows; streaming reads require "
                    "append-only commits. Set ignoreChanges=true to "
                    "receive re-added rows instead (dedup on keys "
                    "downstream)."
                )
            for add in adds:
                parts.append(
                    _PartFile(
                        os.path.join(self._path, add["path"]),
                        dict(add.get("partitionValues") or {}),
                        self._schema_json,
                    )
                )
        return parts

    # -------------------------------------------------- reading
    def read(self, partition: _PartFile) -> Iterator[Any]:
        return _align_batches(
            partition.abs_path,
            partition.partition_values,
            partition.schema_json,
        )

    def commit(self, end: dict) -> None:
        pass


class _IcebergStreamReader(DataSourceStreamReader):
    """Offsets: ``{"snapshot_id": id}`` (0 = before the first
    snapshot). A consumed snapshot that was since expired raises —
    the consumer's history is gone, same failure mode as Iceberg's
    own streaming read."""

    def __init__(self, schema: StructType, options: dict[str, str]):
        self._path = options["path"]
        self._schema_json = schema.json()
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self._starting = options.get("startingsnapshotid")

    def initialOffset(self) -> dict:
        log = _iceberg_log(self._path)
        ids = log.snapshot_ids()
        if self._starting is None:
            return {"snapshot_id": 0}
        if str(self._starting).lower() == "latest":
            return {"snapshot_id": ids[-1] if ids else 0}
        sid = int(self._starting)
        if sid not in ids:
            raise ValueError(f"unknown starting snapshot id {sid}")
        # startingSnapshotId is INCLUSIVE (iceberg convention): the
        # offset is the snapshot before it
        i = ids.index(sid)
        return {"snapshot_id": ids[i - 1] if i else 0}

    def latestOffset(self) -> dict:
        ids = _iceberg_log(self._path).snapshot_ids()
        return {"snapshot_id": ids[-1] if ids else 0}

    def _range(self, log: Any, start_id: int, end_id: int) -> list[dict]:
        md = log.current_metadata()
        snaps = md["snapshots"]
        ids = [s["snapshot-id"] for s in snaps]
        if end_id == 0:
            return []
        if start_id == 0:
            lo = 0
        elif start_id in ids:
            lo = ids.index(start_id) + 1
        else:
            raise ValueError(
                f"streaming offset snapshot {start_id} of "
                f"{self._path} has been expired; restart the query "
                "from a live snapshot"
            )
        hi = ids.index(end_id) + 1
        return snaps[lo:hi]

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from aligned_spark.sources.avro_io import read_container
        from aligned_spark.sources.iceberg_log import ADDED

        log = _iceberg_log(self._path)
        parts: list[InputPartition] = []
        for snap in self._range(
            log, int(start["snapshot_id"]), int(end["snapshot_id"])
        ):
            op = snap.get("summary", {}).get("operation")
            if op == "replace":  # compaction: no row changes
                continue
            if op != "append" and not self._ignore_changes:
                raise ValueError(
                    f"Iceberg snapshot {snap['snapshot-id']} of "
                    f"{self._path} is a {op!r} commit; streaming "
                    "reads require append-only snapshots. Set "
                    "ignoreChanges=true to receive re-added rows."
                )
            _, manifests = read_container(
                os.path.join(self._path, snap["manifest-list"])
            )
            for m in manifests:
                if m["added_snapshot_id"] != snap["snapshot-id"]:
                    continue
                if m.get("content", 0) == 1:  # position deletes
                    continue
                _, entries = read_container(
                    os.path.join(self._path, m["manifest_path"])
                )
                for e in entries:
                    if e["status"] != ADDED:
                        continue
                    df_rec = e["data_file"]
                    parts.append(
                        _PartFile(
                            os.path.join(
                                self._path, df_rec["file_path"]
                            ),
                            dict(df_rec.get("partition") or {}),
                            self._schema_json,
                        )
                    )
        return parts

    def read(self, partition: _PartFile) -> Iterator[Any]:
        return _align_batches(
            partition.abs_path,
            partition.partition_values,
            partition.schema_json,
        )

    def commit(self, end: dict) -> None:
        pass


class TableStreamDataSource(DataSource):
    """``format("aligned_table")`` — streaming reads over the
    engine's Delta/Iceberg logs.

    Options: ``path`` (table root, required), ``format`` ("delta"
    default | "iceberg"), ``startingVersion`` (delta: int | "latest"),
    ``startingSnapshotId`` (iceberg: int, inclusive | "latest"),
    ``ignoreChanges``, ``maxFilesPerTrigger`` (delta)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _opts(self) -> dict[str, str]:
        return {str(k).lower(): v for k, v in self.options.items()}

    def schema(self) -> StructType:
        opts = self._opts()
        path = opts.get("path")
        if not path:
            raise ValueError("aligned_table requires option 'path'")
        fmt = opts.get("format", "delta").lower()
        if fmt == "delta":
            schema = _delta_log(path).snapshot().schema()
            if schema is None:
                raise ValueError(f"Delta table has no metaData: {path}")
            return schema
        if fmt == "iceberg":
            from aligned_spark.sources.iceberg_log import _schema_to_spark

            log = _iceberg_log(path)
            md = log.current_metadata()
            cur = md["current-schema-id"]
            ice = next(
                s for s in md["schemas"] if s["schema-id"] == cur
            )
            return _schema_to_spark(ice)
        raise ValueError(f"unknown table format {fmt!r}")

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        opts = self._opts()
        fmt = opts.get("format", "delta").lower()
        if fmt == "delta":
            return _DeltaStreamReader(schema, opts)
        if fmt == "iceberg":
            return _IcebergStreamReader(schema, opts)
        raise ValueError(f"unknown table format {fmt!r}")


def register(spark: Any) -> None:
    """Idempotently register the data source with this session."""
    key = "_aligned_table_stream_registered"
    if getattr(spark, key, False):
        return
    spark.dataSource.register(TableStreamDataSource)
    setattr(spark, key, True)
