"""Stream sources: Kafka (``KafkaTopicConfig`` ``aligned/sources/
kafka.py:15``, reader ``aligned/streams/kafka.py:13-25``) and the
built-in rate source for tests.

A stream source exposes ``read_stream(spark) -> streaming DataFrame``
with the view's columns. Kafka messages are JSON values decoded with
the declared schema — the reference does the same decode in Python per
batch; here ``from_json`` stays JVM-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class KafkaStreamSource:
    """``spark.readStream.format("kafka")`` + ``from_json`` decode.

    Requires the spark-sql-kafka package on the cluster (not bundled
    in this container — construction is cheap, ``read_stream`` fails
    only when Kafka jars are genuinely absent)."""

    topic: str
    bootstrap_servers: str = "localhost:9092"
    schema_ddl: str = ""
    mapping_keys: dict[str, str] = field(default_factory=dict)
    starting_offsets: str = "latest"

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("subscribe", self.topic)
            .option("startingOffsets", self.starting_offsets)
            .load()
        )
        if not self.schema_ddl:
            raise ValueError("KafkaStreamSource needs schema_ddl to decode JSON")
        decoded = raw.select(
            F.from_json(F.col("value").cast("string"), self.schema_ddl).alias(
                "__v"
            )
        )
        return decoded.select("__v.*")


@dataclass
class FileStreamSource:
    """Directory-watching file stream (``spark.readStream.format(
    "parquet"/"csv"/"json")``) — the auto-loader-style ingestion
    pattern: producers drop files into a path, the stream picks up
    new ones exactly once (checkpointed file index).

    This is the scale-honest landing-zone source: at 100 TB/day the
    directory is date-partitioned object storage, ``maxFilesPerTrigger``
    bounds each micro-batch, and the same downstream
    ``stream_aggregate`` / ``StreamWorker`` pipeline applies
    unchanged. Fills the role of the reference's file-watching
    ``StreamWorker`` sources for non-Kafka deployments
    (``aligned/worker.py:150-242``)."""

    path: str
    format: str = "parquet"
    schema_ddl: str = ""  # required by Spark for file streams
    options: dict[str, str] = field(default_factory=dict)
    max_files_per_trigger: int | None = None
    mapping_keys: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        if not self.schema_ddl:
            raise ValueError(
                "FileStreamSource needs schema_ddl (file streams "
                "cannot infer schema)"
            )
        reader = (
            spark.readStream.format(self.format)
            .schema(self.schema_ddl)
            .options(**self.options)
        )
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        df = reader.load(self.path)
        for old, new in self.mapping_keys.items():
            df = df.withColumnRenamed(old, new)
        return df


@dataclass
class TableStreamSource:
    """Streaming tail of one of the engine's Delta/Iceberg tables —
    ``spark.readStream.format("aligned_table")`` over the commit log
    (version offsets, per-part read tasks, replay-deterministic; see
    :mod:`aligned_spark.streaming.table_stream`). The
    CDC-ingest-to-stream bridge the reference polls for
    (``aligned/worker.py:150-242``) expressed as a native Structured
    Streaming source."""

    path: str
    table_format: str = "delta"  # "delta" | "iceberg"
    #: delta: first commit version to include, or "latest" to tail
    starting_version: int | str | None = None
    #: iceberg: first snapshot id to include, or "latest" to tail
    starting_snapshot_id: int | str | None = None
    #: iceberg: EXCLUSIVE start — tail only snapshots after this id
    #: (0 = the whole history). Unlike the inclusive id above it can
    #: name a point before the tailed snapshots exist, so the stream
    #: may start concurrently with the producer's commits.
    after_snapshot_id: int | None = None
    ignore_changes: bool = False
    max_files_per_trigger: int | None = None
    #: delta only: stream row-level changes with public CDF columns
    #: (``_change_type``/``_commit_version``) instead of raising on
    #: MERGE/DELETE commits — see
    #: :mod:`aligned_spark.streaming.cdf_stream`
    read_change_feed: bool = False
    mapping_keys: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        from aligned_spark.streaming.table_stream import register

        register(spark)
        reader = (
            spark.readStream.format("aligned_table")
            .option("path", self.path)
            .option("format", self.table_format)
        )
        if self.read_change_feed:
            reader = reader.option("readChangeFeed", "true")
        if self.starting_version is not None:
            reader = reader.option(
                "startingVersion", str(self.starting_version)
            )
        if self.starting_snapshot_id is not None:
            reader = reader.option(
                "startingSnapshotId", str(self.starting_snapshot_id)
            )
        if self.after_snapshot_id is not None:
            reader = reader.option(
                "afterSnapshotId", str(self.after_snapshot_id)
            )
        if self.ignore_changes:
            reader = reader.option("ignoreChanges", "true")
        if self.max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        df = reader.load()
        for old, new in self.mapping_keys.items():
            df = df.withColumnRenamed(old, new)
        return df


@dataclass
class RateStreamSource:
    """Deterministic synthetic stream over the built-in rate source —
    the test stand-in for Kafka (same role as the reference's in-memory
    ``ReadableStream``). ``row_fn`` maps the rate (timestamp, value)
    columns onto the view's schema."""

    rows_per_second: int = 100
    row_fn: Any = None  # Callable[[DataFrame], DataFrame]
    mapping_keys: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        df = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .load()
        )
        return self.row_fn(df) if self.row_fn is not None else df
