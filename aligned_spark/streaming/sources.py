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
