"""Storage-layout operators: multi-dimensional clustering for
data-skipping.

Reference capability: none (the reference's sources are row files);
this extends the engine's write path the way a lakehouse would —
Z-ORDER-style clustering so parquet row-group min/max stats prune
scans that filter on MULTIPLE columns at once. Sorting by a single
column gives perfect pruning on that column and none on others; the
Z-curve interleaves the bits of all cluster columns, so rows close on
the curve are close in EVERY dimension and each row group covers a
small hyper-rectangle.

Scale design (100 TB): the key is pure codegen bit arithmetic; the
only non-local step is one min/max aggregate per cluster column (a
single tiny driver scalar, same contract as PageRank's node count)
and the final range repartition on the key — the same one shuffle any
re-layout costs by definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Bit-interleave ``k`` already-scaled [0, 2^bits) longs into one
    Z-value: output bit ``b*k + i`` = bit ``b`` of input ``i``."""
    k = len(scaled)
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, v in enumerate(scaled):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * k + i))
    return out


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """Append ``__zkey`` — the Z-curve position of each row over
    ``cols``.

    Each column is min-max scaled to ``[0, 2^bits)`` (bounds from one
    aggregate; a constant column maps to 0) and the scaled values are
    bit-interleaved. ``len(cols) * bits`` must be <= 63. Timestamps
    should be passed pre-converted to a numeric (e.g. unix micros).
    """
    if len(cols) * bits > 63:
        raise ValueError("len(cols) * bits must fit a signed 64-bit key")
    top = (1 << bits) - 1
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"__lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"__hi_{c}") for c in cols],
    ).first()
    scaled = []
    for c in cols:
        lo = float(bounds[f"__lo_{c}"])
        hi = float(bounds[f"__hi_{c}"])
        span = hi - lo
        if span <= 0:
            scaled.append(F.lit(0).cast("long"))
        else:
            scaled.append(
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * F.lit(float(top))
                ).cast("long")
            )
    return df.withColumn("__zkey", _interleave(scaled, bits))


def cluster_by_zorder(
    df: DataFrame, cols: list[str], num_partitions: int, bits: int = 16
) -> DataFrame:
    """Re-layout ``df`` along the Z-curve of ``cols``: compute the
    key, range-repartition on it (balanced output files), sort within
    partitions so parquet row groups carry tight min/max stats on
    EVERY cluster column, then drop the key. Write the result with
    one file per partition for a skipping-friendly table."""
    keyed = zorder_key(df, cols, bits)
    return (
        keyed.repartitionByRange(num_partitions, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )


def zorder_key_sql(cols: list[str], los: list[float], his: list[float],
                   bits: int = 16) -> str:
    """The identical key as one SQL expression (bounds as literals) —
    bit-for-bit the oracle replay of :func:`zorder_key`."""
    top = (1 << bits) - 1
    k = len(cols)
    scaled = []
    for c, lo, hi in zip(cols, los, his):
        span = hi - lo
        if span <= 0:
            scaled.append("CAST(0 AS BIGINT)")
        else:
            scaled.append(
                f"CAST(floor((CAST({c} AS DOUBLE) - {lo!r}) / {span!r}"
                f" * {float(top)!r}) AS BIGINT)"
            )
    terms = []
    for b in range(bits):
        for i, s in enumerate(scaled):
            terms.append(f"((({s} >> {b}) & 1) << {b * k + i})")
    return "(" + " | ".join(terms) + ")"


def _fs_and_path(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def describe_layout(spark, path: str) -> DataFrame:
    """File-level layout statistics for a table directory: one row
    ``(file, bytes)`` per data file (metadata/_SUCCESS excluded).

    The maintenance-planning primitive: small-file ratio, total bytes,
    and file-size skew all derive from it with plain aggregations.
    Listing goes through the Hadoop FileSystem API, so it works on any
    configured scheme; cost is proportional to file COUNT (a driver
    listing — the same contract as any compaction planner's)."""
    fs, jpath = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    rows = []
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        base = name.rsplit("/", 1)[-1]
        if base.startswith("_") or base.startswith("."):
            continue
        rows.append((name, int(st.getLen())))
    return spark.createDataFrame(rows, "file string, bytes long")


def compact_parquet(
    spark,
    path: str,
    target_bytes: int = 128 << 20,
    order_cols: list[str] | None = None,
) -> int:
    """Small-files maintenance (the OPTIMIZE of a plain-parquet
    table): rewrite ``path`` into ``ceil(total_bytes / target_bytes)``
    files, optionally range-sorted by ``order_cols`` so the rewrite
    restores clustering (compose with :func:`zorder_key` by passing
    ``["__zkey"]`` on a keyed frame). Returns the output file count.

    Ten thousand 1 MB files cost a 100 TB scan ~10k task setups and
    defeat row-group pruning; nightly compaction to ~128 MB is the
    standard counter. The rewrite lands in a temp directory first and
    swaps in via two FS renames — readers between the renames can see
    a missing directory (plain parquet has no transaction log;
    Delta's OPTIMIZE, gated in this container, is the transactional
    answer — `sources/delta.py`)."""
    import math

    from aligned_spark.sources.file import read_parquet

    sizes = describe_layout(spark, path).agg(
        F.sum("bytes").alias("b"), F.count("*").alias("n")
    ).first()
    total = sizes["b"] or 0
    n_out = max(1, math.ceil(total / target_bytes))
    df = read_parquet(spark, path)
    if order_cols:
        out = df.repartitionByRange(
            n_out, *[F.col(c) for c in order_cols]
        ).sortWithinPartitions(*order_cols)
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    fs, jpath = _fs_and_path(spark, path)
    _, jtmp = _fs_and_path(spark, tmp)
    bak = path.rstrip("/") + "__compact_old"
    _, jbak = _fs_and_path(spark, bak)
    if not fs.rename(jpath, jbak):
        raise IOError(f"compaction swap failed renaming {path} aside")
    if not fs.rename(jtmp, jpath):
        fs.rename(jbak, jpath)  # roll back
        raise IOError(f"compaction swap failed installing {tmp}")
    fs.delete(jbak, True)
    return n_out
