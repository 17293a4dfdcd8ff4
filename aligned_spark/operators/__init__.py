"""DataFrame → DataFrame operators (the RetrievalJob surface, Spark-first)."""

from aligned_spark.operators.core import (
    select_columns,
    filter_rows,
    rename,
    drop_duplicate_entities,
    unique_rows,
    limit,
    ensure_types,
    fill_missing_columns,
    validate_entities,
    derive,
    stack,
    with_loaded_at,
)
from aligned_spark.operators.joins import equi_join, asof_join, pit_join
from aligned_spark.operators.aggregate import (
    AggSpec,
    group_aggregate,
    rolling_aggregate,
    hopping_aggregate,
)
from aligned_spark.operators.splits import (
    leakage_safe_split,
    train_test_split,
    train_test_validate_split,
)

__all__ = [
    "select_columns",
    "filter_rows",
    "rename",
    "drop_duplicate_entities",
    "unique_rows",
    "limit",
    "ensure_types",
    "fill_missing_columns",
    "validate_entities",
    "derive",
    "stack",
    "with_loaded_at",
    "equi_join",
    "asof_join",
    "pit_join",
    "AggSpec",
    "group_aggregate",
    "rolling_aggregate",
    "hopping_aggregate",
    "leakage_safe_split",
    "train_test_split",
    "train_test_validate_split",
]
