"""Shared change-data-feed reconstruction for the table formats.

A copy-on-write rewrite commit replaces whole parts; the naive change
feed (`DeltaLog.read_changes` / `IcebergLog.read_appends`) re-emits
every surviving row of a rewritten part, which breaks downstream
incremental consumers (a 1-row MERGE into a 1,000-row part looks
like 1,000 changed rows). :func:`diff_rewrite` reconstructs the TRUE
row-level changes by diffing the removed parts' old content against
the added parts' new content:

- keyed (the merge keys the MERGE commit recorded): full-outer join
  on the keys → ``update_preimage``/``update_postimage`` pairs for
  changed rows, ``delete`` for vanished keys, ``insert`` for new
  keys — surviving rows (same key, same values) are excluded;
- unkeyed (DELETE/replaceWhere commits): whole-row ``exceptAll``
  both ways — updates appear as delete+insert, still exactly-once.

Scale: the join/except runs over ONLY the commit's touched parts
(the 1-row-MERGE-into-100 TB case reads the handful of rewritten
files twice); pure appends never reach here. Column semantics match
public Delta CDF (``_change_type``; the version column name is the
caller's)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tag_changes(
    df: DataFrame, cols: list[str], ctype: str, version_col: str, version
) -> DataFrame:
    return df.select(
        *cols,
        F.lit(ctype).alias("_change_type"),
        F.lit(version).cast("long").alias(version_col),
    )


def diff_rewrite(
    old: DataFrame,
    new: DataFrame,
    cols: list[str],
    keys: list[str] | None,
    version_col: str,
    version,
) -> list[DataFrame]:
    """True row-level changes of one copy-on-write rewrite commit;
    see the module docstring."""
    rest = [c for c in cols if c not in (keys or [])]
    out: list[DataFrame] = []
    if keys and rest:
        o = old.select(*keys, F.struct(*rest).alias("__o"))
        n = new.select(*keys, F.struct(*rest).alias("__n"))
        j = o.join(n, on=keys, how="full_outer")
        changed = j.filter(
            F.col("__o").isNotNull()
            & F.col("__n").isNotNull()
            & ~F.col("__o").eqNullSafe(F.col("__n"))
        )
        out.append(
            tag_changes(
                changed.select(*keys, "__o.*"),
                cols,
                "update_preimage",
                version_col,
                version,
            )
        )
        out.append(
            tag_changes(
                changed.select(*keys, "__n.*"),
                cols,
                "update_postimage",
                version_col,
                version,
            )
        )
        out.append(
            tag_changes(
                j.filter(F.col("__n").isNull()).select(*keys, "__o.*"),
                cols,
                "delete",
                version_col,
                version,
            )
        )
        out.append(
            tag_changes(
                j.filter(F.col("__o").isNull()).select(*keys, "__n.*"),
                cols,
                "insert",
                version_col,
                version,
            )
        )
    else:
        out.append(
            tag_changes(
                old.exceptAll(new), cols, "delete", version_col, version
            )
        )
        out.append(
            tag_changes(
                new.exceptAll(old), cols, "insert", version_col, version
            )
        )
    return out
