"""JDBC sources (reference ``PostgreSQLDataSource``
``aligned/sources/psql.py:65``, ``RedshiftSQLDataSource``
``aligned/sources/redshift.py:80``).

The reference ships ~1.4k LoC of SQL code generation
(``aligned/psql/jobs.py``, ``aligned/redshift/jobs.py``) to push whole
query plans into the database. Spark-first, that codegen is dropped:
``spark.read.jdbc`` scans the table (with partitioned reads for
parallelism), Catalyst pushes filters/projections through the JDBC
source, and the plan runs on the cluster — strictly more scalable
than computing inside one database.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from aligned_spark.sources.base import BatchSource


@dataclass
class JdbcSource(BatchSource):
    url: str
    table: str
    driver: str | None = None
    properties: dict[str, str] = field(default_factory=dict)
    #: numeric column + bounds for parallel partitioned reads
    partition_column: str | None = None
    num_partitions: int = 8
    lower_bound: int | None = None
    upper_bound: int | None = None

    def job_group_key(self) -> str:
        return f"jdbc:{self.url}:{self.table}"

    def read(self, spark: SparkSession) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column and self.lower_bound is not None:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("numPartitions", str(self.num_partitions))
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
            )
        return reader.load()


@dataclass
class PostgreSQLSource(JdbcSource):
    driver: str | None = "org.postgresql.Driver"


@dataclass
class RedshiftSource(JdbcSource):
    driver: str | None = "com.amazon.redshift.jdbc42.Driver"
