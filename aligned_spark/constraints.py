"""Data-quality constraints → boolean Column predicates.

Reference: ``aligned/schemas/constraints.py:9-73`` registry with
concrete constraints at ``:76-263``; enforced by ``DropInvalidJob`` /
``ReturnInvalidJob`` (``aligned/retrieval_job.py:2264-2311``).

In Spark a constraint is just a boolean ``Column``; drop-invalid is
``df.filter(all_valid)`` and return-invalid is ``df.filter(~all_valid)``
— both fully pushed down by Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Constraint:
    kind: ClassVar[str] = "constraint"

    def predicate(self, column: str) -> Column:
        """True for rows satisfying the constraint (nulls pass unless
        the constraint is Required)."""
        raise NotImplementedError

    def _null_ok(self, column: str, cond: Column) -> Column:
        return F.col(column).isNull() | cond


@dataclass
class LowerBound(Constraint):
    kind: ClassVar[str] = "lower_bound"
    value: float

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column) > self.value)


@dataclass
class LowerBoundInclusive(Constraint):
    kind: ClassVar[str] = "lower_bound_inc"
    value: float

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column) >= self.value)


@dataclass
class UpperBound(Constraint):
    kind: ClassVar[str] = "upper_bound"
    value: float

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column) < self.value)


@dataclass
class UpperBoundInclusive(Constraint):
    kind: ClassVar[str] = "upper_bound_inc"
    value: float

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column) <= self.value)


@dataclass
class MinLength(Constraint):
    kind: ClassVar[str] = "min_length"
    value: int

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.length(F.col(column)) >= self.value)


@dataclass
class MaxLength(Constraint):
    kind: ClassVar[str] = "max_length"
    value: int

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.length(F.col(column)) <= self.value)


@dataclass
class Regex(Constraint):
    kind: ClassVar[str] = "regex"
    pattern: str

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column).rlike(self.pattern))


@dataclass
class StartsWith(Constraint):
    kind: ClassVar[str] = "starts_with"
    value: str

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column).startswith(self.value))


@dataclass
class EndsWith(Constraint):
    kind: ClassVar[str] = "ends_with"
    value: str

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column).endswith(self.value))


@dataclass
class InDomain(Constraint):
    kind: ClassVar[str] = "in_domain"
    values: list

    def predicate(self, column: str) -> Column:
        return self._null_ok(column, F.col(column).isin(list(self.values)))


@dataclass
class Required(Constraint):
    """Inverse of the reference's ``Optional`` marker — non-optional
    columns must be non-null."""

    kind: ClassVar[str] = "required"

    def predicate(self, column: str) -> Column:
        return F.col(column).isNotNull()


@dataclass
class Unique(Constraint):
    """Marker constraint — uniqueness is relational, not row-local;
    enforced by :func:`validate_unique` (a groupBy), used by
    upsert/dedup logic, not by the row filter."""

    kind: ClassVar[str] = "unique"

    def predicate(self, column: str) -> Column:
        return F.lit(True)


def all_valid_predicate(constraints: dict[str, list[Constraint]]) -> Column:
    """AND-fold all row-local constraint predicates."""
    pred = F.lit(True)
    for column, items in constraints.items():
        for c in items:
            pred = pred & c.predicate(column)
    return pred


def drop_invalid(df: DataFrame, constraints: dict[str, list[Constraint]]) -> DataFrame:
    return df.filter(all_valid_predicate(constraints))


def return_invalid(
    df: DataFrame, constraints: dict[str, list[Constraint]]
) -> DataFrame:
    return df.filter(~all_valid_predicate(constraints))


def validate_unique(df: DataFrame, columns: list[str]) -> DataFrame:
    """Rows whose key appears more than once (empty == constraint holds)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*columns)
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") > 1)
        .drop("__n")
    )
