"""Train/test/validate dataset splits.

Reference: ``TrainTestJob`` ``retrieval_job.py:145``,
``TrainTestValidateJob:281``, stratified fraction split on a
categorical target (``aligned/split_strategy.py``), event-time-ordered
when an event timestamp is present.

Spark formulation: a single ``percent_rank`` window per strata —
ordered by event time when given (temporal split: oldest → train),
otherwise by a deterministic per-row hash (stable pseudo-random
split, reproducible across runs and partitionings — unlike
``df.randomSplit`` which depends on partition layout). One shuffle,
no driver-side sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _ranked(
    df: DataFrame,
    target: str | None,
    event_timestamp: str | None,
    seed: int,
) -> DataFrame:
    if event_timestamp is not None:
        order: Column = F.col(event_timestamp).asc()
    else:
        order = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)).asc()
    strata = [target] if target else []
    w = W.partitionBy(*strata).orderBy(order)
    return df.withColumn("__pr", F.percent_rank().over(w))


def train_test_split(
    df: DataFrame,
    test_fraction: float,
    target: str | None = None,
    event_timestamp: str | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(train, test). Stratified per ``target`` when given; temporal
    (oldest rows → train) when ``event_timestamp`` is given."""
    ranked = _ranked(df, target, event_timestamp, seed)
    boundary = 1.0 - test_fraction
    train = ranked.filter(F.col("__pr") < boundary).drop("__pr")
    test = ranked.filter(F.col("__pr") >= boundary).drop("__pr")
    return train, test


def train_test_validate_split(
    df: DataFrame,
    test_fraction: float,
    validate_fraction: float,
    target: str | None = None,
    event_timestamp: str | None = None,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, validate) — fractions of the whole frame."""
    ranked = _ranked(df, target, event_timestamp, seed)
    b1 = 1.0 - test_fraction - validate_fraction
    b2 = 1.0 - validate_fraction
    train = ranked.filter(F.col("__pr") < b1).drop("__pr")
    test = ranked.filter((F.col("__pr") >= b1) & (F.col("__pr") < b2)).drop("__pr")
    validate = ranked.filter(F.col("__pr") >= b2).drop("__pr")
    return train, test, validate
