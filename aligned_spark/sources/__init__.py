"""Batch/stream source connectors (reference ``aligned/sources/``)."""

from aligned_spark.sources.base import BatchSource, WritableSource
from aligned_spark.sources.file import (
    CsvSource,
    JsonSource,
    ParquetSource,
    PartitionedParquetSource,
    FileSource,
)
from aligned_spark.sources.in_memory import InMemorySource
from aligned_spark.sources.delta import DeltaSource
from aligned_spark.sources.jdbc import JdbcSource, PostgreSQLSource, RedshiftSource
from aligned_spark.sources.catalog import TableSource, SqlSource
from aligned_spark.sources.combinators import (
    FilteredSource,
    JoinAsofSource,
    LoadedAtSource,
    StackedSource,
    TransformSource,
    CustomMethodSource,
)
from aligned_spark.sources.random_source import RandomSource
from aligned_spark.sources.s3 import S3Source
from aligned_spark.sources.azure_blob import AzureBlobSource

__all__ = [
    "BatchSource",
    "WritableSource",
    "CsvSource",
    "JsonSource",
    "ParquetSource",
    "PartitionedParquetSource",
    "FileSource",
    "InMemorySource",
    "DeltaSource",
    "JdbcSource",
    "PostgreSQLSource",
    "RedshiftSource",
    "TableSource",
    "SqlSource",
    "FilteredSource",
    "JoinAsofSource",
    "LoadedAtSource",
    "StackedSource",
    "TransformSource",
    "CustomMethodSource",
    "RandomSource",
    "S3Source",
    "AzureBlobSource",
]
