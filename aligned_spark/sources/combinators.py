"""Source combinators (reference ``aligned/data_source/batch_data_source.py``):
``FilteredDataSource:793``, ``JoinAsofDataSource:1017``,
``StackSource:1150``, ``LoadedAtSource:1289``, ``TransformSource:515``,
``CustomMethodDataSource:577``."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.sources.base import BatchSource


@dataclass
class FilteredSource(BatchSource):
    """Predicate applied at the scan — Catalyst pushes it into the
    file/JDBC reader."""

    source: BatchSource
    predicate: Any  # Column | Expr | SQL string

    def job_group_key(self) -> str:
        return f"filtered:{self.source.job_group_key()}"

    def read(self, spark: SparkSession) -> DataFrame:
        from aligned_spark.operators.core import filter_rows

        return filter_rows(self.source.read(spark), self.predicate)


@dataclass
class JoinAsofSource(BatchSource):
    """As-of join two sources at scan time."""

    left: BatchSource
    right: BatchSource
    left_on: str
    right_on: str
    by: list[str] = field(default_factory=list)

    def job_group_key(self) -> str:
        return f"asof:{self.left.job_group_key()}:{self.right.job_group_key()}"

    def read(self, spark: SparkSession) -> DataFrame:
        from aligned_spark.operators.joins import asof_join

        return asof_join(
            self.left.read(spark),
            self.right.read(spark),
            on=self.left_on,
            right_on=self.right_on,
            by=self.by,
        )


@dataclass
class StackedSource(BatchSource):
    """Union of sources with optional provenance column."""

    sources: list[BatchSource]
    source_column: str | None = None
    source_names: list[str] | None = None

    def job_group_key(self) -> str:
        return "stack:" + ",".join(s.job_group_key() for s in self.sources)

    def read(self, spark: SparkSession) -> DataFrame:
        from aligned_spark.operators.core import stack

        return stack(
            [s.read(spark) for s in self.sources],
            self.source_column,
            self.source_names,
        )


@dataclass
class LoadedAtSource(BatchSource):
    source: BatchSource
    column: str = "loaded_at"

    def job_group_key(self) -> str:
        return f"loaded_at:{self.source.job_group_key()}"

    def read(self, spark: SparkSession) -> DataFrame:
        return self.source.read(spark).withColumn(self.column, F.current_timestamp())


@dataclass
class TransformSource(BatchSource):
    """Post-read DataFrame → DataFrame lambda (``TransformSource:515``)."""

    source: BatchSource
    fn: Callable[[DataFrame], DataFrame]

    def job_group_key(self) -> str:
        return f"transform:{self.source.job_group_key()}"

    def read(self, spark: SparkSession) -> DataFrame:
        return self.fn(self.source.read(spark))


@dataclass
class CustomMethodSource(BatchSource):
    """User function returning a DataFrame
    (``CustomMethodDataSource:577`` — without the dill serialization;
    contracts holding one of these are process-local)."""

    all_data_fn: Callable[[SparkSession], DataFrame]

    def job_group_key(self) -> str:
        return f"custom:{id(self.all_data_fn)}"

    def read(self, spark: SparkSession) -> DataFrame:
        return self.all_data_fn(spark)


@dataclass
class JoinedSource(BatchSource):
    """Equi-join two sources at scan time (``JoinDataSource``,
    ``batch_data_source.py:1342-1380``: left/right key lists +
    method). Right keys rename onto the left's so the join condition
    is a plain column list — Catalyst then picks broadcast vs
    shuffle; at 100 TB broadcast the small side or pre-bucket both
    on the keys."""

    left: BatchSource
    right: BatchSource
    left_on: list[str] = field(default_factory=list)
    right_on: list[str] = field(default_factory=list)
    method: str = "inner"  # "inner" | "left" | "outer"

    def job_group_key(self) -> str:
        return (
            f"join:{self.left.job_group_key()}"
            f":{self.right.job_group_key()}"
        )

    def read(self, spark: SparkSession) -> DataFrame:
        if len(self.left_on) != len(self.right_on) or not self.left_on:
            raise ValueError(
                "left_on/right_on must be equal-length, non-empty"
            )
        ldf = self.left.read(spark)
        rdf = self.right.read(spark)
        for lo, ro in zip(self.left_on, self.right_on):
            if ro != lo:
                rdf = rdf.withColumnRenamed(ro, lo)
        return ldf.join(rdf, on=list(self.left_on), how=self.method)


def _camel_to_snake(name: str) -> str:
    import re

    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s).lower()


def _snake_to_camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:])


def _snake_to_pascal(name: str) -> str:
    return "".join(p.title() for p in name.split("_"))


def rename_convention(df: DataFrame, renamer_type: str) -> DataFrame:
    """Column-naming-convention renamer (reference ``Renamer``,
    ``aligned/sources/renamer.py:29-60``: the CSV-source hook that
    maps external camelCase headers onto snake_case contracts and
    back on write). Pure metadata — no job runs."""
    fns = {
        "camel_to_snake": _camel_to_snake,
        "snake_to_camel": _snake_to_camel,
        "snake_to_pascal": _snake_to_pascal,
        "noop": lambda n: n,
    }
    if renamer_type not in fns:
        raise ValueError(
            f"unknown renamer {renamer_type!r}; pick from {sorted(fns)}"
        )
    fn = fns[renamer_type]
    mapping = {c: fn(c) for c in df.columns if fn(c) != c}
    # collision guard: 'userId' and 'user_id' both map to 'user_id';
    # withColumnsRenamed would happily return a frame with duplicate
    # column names that only blows up (ambiguous reference) at first
    # use downstream — fail here with the clashing source columns
    final = [mapping.get(c, c) for c in df.columns]
    seen: dict[str, list[str]] = {}
    for src, tgt in zip(df.columns, final):
        seen.setdefault(tgt, []).append(src)
    clashes = {t: srcs for t, srcs in seen.items() if len(srcs) > 1}
    if clashes:
        detail = "; ".join(
            f"{srcs} -> {t!r}" for t, srcs in sorted(clashes.items())
        )
        raise ValueError(
            f"rename_convention({renamer_type!r}) produces duplicate "
            f"column names: {detail}"
        )
    return df.withColumnsRenamed(mapping) if mapping else df
