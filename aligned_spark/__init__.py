"""aligned_spark — a PySpark-native feature-store / analytics engine.

A from-scratch rebuild of the capabilities of MatsMoll/aligned (a
Polars-first feature-store framework) on top of Apache Spark:
DataFrames are the only execution substrate, Catalyst is the
optimizer, and every operator is expressed with built-in
``pyspark.sql`` primitives (joins + windows + aggregates) unless the
semantics genuinely require an Arrow-batched Pandas UDF.

Public surface (see SURVEY.md for the reference parity map):

- :mod:`aligned_spark.types` — FeatureType system with Spark mapping
- :mod:`aligned_spark.expr` — serializable expression IR lowered to Column
- :mod:`aligned_spark.contracts` — ``@feature_view`` / ``@model_contract`` DSL
- :mod:`aligned_spark.store` — ContractStore (features_for, execute_sql, ...)
- :mod:`aligned_spark.operators` — PIT join, as-of join, aggregations,
  dedup, similarity search, text analysis, splits
- :mod:`aligned_spark.sources` — parquet/csv/delta/in-memory/jdbc connectors
- :mod:`aligned_spark.streaming` — Structured Streaming port of the
  reference's micro-batch stream worker
"""

from aligned_spark.session import get_spark, stop_spark
from aligned_spark.types import FeatureType
from aligned_spark.contracts import feature_view, load_feature, model_contract
from aligned_spark.store import ContractStore

__version__ = "0.2.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "FeatureType",
    "feature_view",
    "load_feature",
    "model_contract",
    "ContractStore",
]
