"""Constraint-driven synthetic data source (reference
``aligned/sources/random_source.py:24-120``; powers
``ContractStore.dummy_store`` test fixtures,
``feature_store.py:300-330``).

Generation is distributed: ``spark.range(n)`` + deterministic
column expressions seeded by ``xxhash64(id, seed)`` — no driver-side
row materialization, so a billion-row dummy table costs nothing on
the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.constraints import (
    InDomain,
    LowerBound,
    LowerBoundInclusive,
    UpperBound,
    UpperBoundInclusive,
)
from aligned_spark.sources.base import BatchSource
from aligned_spark.types import FeatureType

if TYPE_CHECKING:
    from aligned_spark.contracts import CompiledFeatureView


def _unit(col: Column, seed: int, salt: int) -> Column:
    """Deterministic uniform [0,1) from the row id."""
    h = F.xxhash64(col, F.lit(seed), F.lit(salt))
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


@dataclass
class RandomSource(BatchSource):
    view: "CompiledFeatureView"
    rows: int = 1000
    seed: int = 42

    def job_group_key(self) -> str:
        return f"random:{self.view.name}:{self.rows}:{self.seed}"

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.range(self.rows)
        cols: dict[str, Column] = {}
        for i, feature in enumerate(self.view.features):
            cols[feature.name] = self._column_for(
                feature.name, feature.dtype, F.col("id"), i
            )
        return df.withColumns(cols).drop("id")

    def _column_for(
        self, name: str, dtype: FeatureType, id_col: Column, salt: int
    ) -> Column:
        u = _unit(id_col, self.seed, salt)
        constraints = self.view.constraints.get(name, [])
        lo, hi = 0.0, 100.0
        domain: list | None = None
        for c in constraints:
            if isinstance(c, (LowerBound, LowerBoundInclusive)):
                lo = float(c.value)
            elif isinstance(c, (UpperBound, UpperBoundInclusive)):
                hi = float(c.value)
            elif isinstance(c, InDomain):
                domain = list(c.values)
        if domain:
            arr = F.array(*[F.lit(v) for v in domain])
            return F.element_at(
                arr, (u * len(domain)).cast("int") + 1
            ).cast(dtype.spark_type)

        base = dtype.base_name
        if base in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
            return (F.lit(lo) + u * (hi - lo)).cast(dtype.spark_type)
        if base in ("float32", "float64"):
            return (F.lit(lo) + u * (hi - lo)).cast(dtype.spark_type)
        if base == "bool":
            return u > 0.5
        if base == "string" or base == "uuid":
            return F.concat(F.lit(f"{name}_"), F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(1000)).cast("string"))
        if base == "datetime":
            start = F.lit("2024-01-01 00:00:00").cast("timestamp")
            return F.timestamp_seconds(
                F.unix_timestamp(start) + (u * 86400 * 365).cast("long")
            )
        if base == "date":
            return F.date_add(F.lit("2024-01-01").cast("date"), (u * 365).cast("int"))
        if base == "embedding" or base == "array":
            size = dtype.embedding_size or 4
            return F.array(
                *[
                    (_unit(id_col, self.seed, salt * 100 + j) * 2 - 1).cast("float")
                    for j in range(size)
                ]
            )
        return F.lit(None).cast(dtype.spark_type)
