"""Train/test/validate dataset splits.

Reference: ``TrainTestJob`` ``retrieval_job.py:145``,
``TrainTestValidateJob:281``, stratified fraction split on a
categorical target (``aligned/split_strategy.py``), event-time-ordered
when an event timestamp is present.

Spark formulation, by case:

- **random (no target, no timestamp)** — a deterministic per-row
  hash mapped to [0,1) is the split coordinate directly:
  ``pmod(xxhash64(cols, seed), 2^20) / 2^20``. No window, no sort, no
  shuffle — embarrassingly parallel, the only formulation that holds
  at 100 TB. (A global ``percent_rank`` window would funnel every row
  through ONE task.) Fractions are exact in expectation, ±O(1/√n)
  realized — the same contract as ``df.randomSplit``, but stable
  across runs and partition layouts.
- **stratified / temporal** — ``percent_rank`` over
  ``Window.partitionBy(strata)`` ordered by event time (temporal:
  oldest → train) or the hash (stratified random). Exact fractions
  per stratum; parallelism = #strata, so strata must be
  low-cardinality categories (they are: class labels). The
  unstratified-temporal case keeps the global window — a total
  time-order is inherently a global sort; callers at scale should
  stratify or pre-bucket by coarse time range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_HASH_BUCKETS = 1 << 20

# Knuth multiplicative constant (odd, ≈ 2^31.3) and a power-of-two
# bucket count small enough that bucket * constant stays < 2^62 —
# every step is exact int64 arithmetic, replayable in ANSI SQL.
_MULT_A = 2654435761
_MULT_BUCKETS = 1 << 30


def _ranked(
    df: DataFrame,
    target: str | None,
    event_timestamp: str | None,
    seed: int,
    key_cols: list[str] | None = None,
) -> DataFrame:
    if key_cols is not None and event_timestamp is None and target is None:
        # Keyed multiplicative-hash coordinate: h starts at the seed,
        # then per key column h = ((h + col) mod 2^30) · A mod 2^30.
        # Same scale contract as the xxhash64 path (stateless, no
        # shuffle), with two extra properties: the assignment is
        # stable under schema additions (whole-row hashing is not),
        # and the formula is exactly mirrorable in SQL (the driver's
        # DuckDB oracle replays it bit-for-bit).
        dtypes = dict(df.dtypes)
        bad = [
            c for c in key_cols
            if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint", "long")
        ]
        if bad:
            # non-integer keys cast("long") to NULL → NULL coordinate
            # → the row matches NEITHER split filter and silently
            # vanishes from both sides
            raise TypeError(
                f"key_cols must be integer columns; got "
                f"{[(c, dtypes.get(c)) for c in bad]} "
                f"(hash a surrogate key first)"
            )
        h = F.lit(seed).cast("long")
        for c in key_cols:
            h = F.pmod(
                F.pmod(h + F.col(c).cast("long"), F.lit(_MULT_BUCKETS))
                * F.lit(_MULT_A),
                F.lit(_MULT_BUCKETS),
            )
        # coord and the fraction boundaries are exact doubles (2^30
        # divides exactly), so the comparison is deterministic
        coord = h.cast("double") / F.lit(float(_MULT_BUCKETS))
        return df.withColumn("__pr", coord)
    if event_timestamp is None and target is None:
        # scale path: hash coordinate, no window/sort
        h = F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
        coord = F.pmod(h, F.lit(_HASH_BUCKETS)).cast("double") / F.lit(
            float(_HASH_BUCKETS)
        )
        return df.withColumn("__pr", coord)
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
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(train, test). Stratified per ``target`` when given; temporal
    (oldest rows → train) when ``event_timestamp`` is given. With
    ``key_cols`` the coordinate is a multiplicative hash of exactly
    those (numeric) columns — stable under schema changes and
    SQL-mirrorable."""
    ranked = _ranked(df, target, event_timestamp, seed, key_cols)
    boundary = 1.0 - test_fraction
    train = ranked.filter(F.col("__pr") < boundary).drop("__pr")
    test = ranked.filter(F.col("__pr") >= boundary).drop("__pr")
    return train, test


def subset_range(
    df: DataFrame,
    start_ratio: float,
    end_ratio: float,
    sort_column: str | None = None,
    seed: int = 42,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Ratio-window subset — the reference's ``SubsetJob``
    (``aligned/retrieval_job.py:1580-1601``): the rows whose split
    coordinate falls in ``[start_ratio, end_ratio)`` (``end_ratio ==
    1.0`` closes the interval so the maximal row is reachable). With
    ``sort_column`` the coordinate is ``percent_rank`` in that order
    (the reference sorts then slices — a global window, inherent to a
    total order; stratify or pre-bucket at scale); without it the
    stateless hash coordinate (``key_cols`` → the SQL-mirrorable
    multiplicative hash), the no-sort no-shuffle scale path."""
    if not 0.0 <= start_ratio <= end_ratio <= 1.0:
        raise ValueError(
            f"need 0 <= start <= end <= 1, got "
            f"[{start_ratio}, {end_ratio})"
        )
    ranked = _ranked(df, None, sort_column, seed, key_cols)
    hi = (
        F.col("__pr") <= F.lit(1.0)
        if end_ratio == 1.0
        else F.col("__pr") < F.lit(end_ratio)
    )
    return ranked.filter(
        (F.col("__pr") >= F.lit(start_ratio)) & hi
    ).drop("__pr")


def train_test_validate_split(
    df: DataFrame,
    test_fraction: float,
    validate_fraction: float,
    target: str | None = None,
    event_timestamp: str | None = None,
    seed: int = 42,
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(train, test, validate) — fractions of the whole frame."""
    ranked = _ranked(df, target, event_timestamp, seed, key_cols)
    b1 = 1.0 - test_fraction - validate_fraction
    b2 = 1.0 - validate_fraction
    train = ranked.filter(F.col("__pr") < b1).drop("__pr")
    test = ranked.filter((F.col("__pr") >= b1) & (F.col("__pr") < b2)).drop("__pr")
    validate = ranked.filter(F.col("__pr") >= b2).drop("__pr")
    return train, test, validate


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    labels: DataFrame,
    test_fraction: float,
    seed: int = 42,
    label_node_col: str = "node",
    label_col: str = "label",
    group_col: str = "group_id",
    split_col: str = "split",
) -> DataFrame:
    """Near-duplicate-aware train/test assignment: the split unit is
    the duplicate GROUP, so no near-dup pair can straddle train and
    test — the leakage an eval set actually needs to exclude. (The
    reference splits rows independently, ``split_strategy.py``; this
    composes its split contract with the dedup pillar's transitive
    closure.)

    ``labels`` is a ``(node, label)`` frame — the output of
    :func:`~aligned_spark.operators.dedup.connected_components` over a
    near-dup pair graph. Ids absent from it are singleton groups
    (group = own id, via ``coalesce``). The pair graph holds only ids
    that COLLIDED, orders of magnitude smaller than the corpus, so
    the group join broadcasts; the coordinate is the same exact-int64
    multiplicative hash as the ``key_cols`` split path (SQL-
    replayable, stateless, no shuffle on the corpus side).

    Returns ``df`` + ``group_col`` + ``split_col`` ('train'/'test') —
    callers filter; keeping one frame preserves the group column for
    leakage audits."""
    if not 0.0 < test_fraction < 1.0:
        raise ValueError(f"need 0 < test_fraction < 1, got {test_fraction}")
    for c in (group_col, split_col):
        if c in df.columns:
            raise ValueError(f"column {c!r} already present in df")
    id_dtype = dict(df.dtypes).get(id_col)
    if id_dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        # a cast("long") on e.g. string ids would yield NULL → NULL
        # hash → every row silently lands in 'train'; fail instead
        raise TypeError(
            f"leakage_safe_split needs an integer id column; "
            f"{id_col!r} is {id_dtype!r} (hash a surrogate id first)"
        )
    lab = labels.select(
        F.col(label_node_col).alias(id_col),
        F.col(label_col).alias(group_col),
    )
    joined = df.join(F.broadcast(lab), on=id_col, how="left").withColumn(
        group_col, F.coalesce(F.col(group_col), F.col(id_col))
    )
    h = F.pmod(
        F.pmod(
            F.lit(seed).cast("long") + F.col(group_col).cast("long"),
            F.lit(_MULT_BUCKETS),
        )
        * F.lit(_MULT_A),
        F.lit(_MULT_BUCKETS),
    )
    coord = h.cast("double") / F.lit(float(_MULT_BUCKETS))
    return joined.withColumn(
        split_col,
        F.when(coord >= F.lit(1.0 - test_fraction), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
