"""Core row/column operators — the ModificationJob surface of the
reference (``aligned/retrieval_job.py``, SURVEY.md §2.2) as plain
DataFrame → DataFrame functions.

Everything is declarative Column algebra: Catalyst sees through every
operator here (filters push to the scan, projections prune parquet
columns, withColumns collapse into one projection), so stacking these
does not cost extra passes at any scale.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from aligned_spark.expr import Expr
from aligned_spark.types import FeatureType


def _as_column(predicate: Column | Expr | str) -> Column:
    if isinstance(predicate, Column):
        return predicate
    if isinstance(predicate, Expr):
        return predicate.to_spark()
    if isinstance(predicate, str):
        return F.expr(predicate)
    raise TypeError(f"cannot treat {type(predicate)} as a filter predicate")


def select_columns(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Project to selected columns (``SelectColumnsJob``,
    ``retrieval_job.py:3150-3196``). Missing names are skipped, like
    the reference's intersection semantics."""
    present = [c for c in columns if c in df.columns]
    return df.select(*present)


def filter_rows(df: DataFrame, predicate: Column | Expr | str) -> DataFrame:
    """Filter by Column / IR expression / SQL string (``FilteredJob``,
    ``retrieval_job.py:1951-2053``). Successive calls AND-fold for free
    in Catalyst."""
    return df.filter(_as_column(predicate))


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename columns (``RenameJob``, ``retrieval_job.py:2077-2108``)."""
    effective = {k: v for k, v in mapping.items() if k in df.columns and k != v}
    return df.withColumnsRenamed(effective) if effective else df


def drop_duplicate_entities(df: DataFrame, entities: list[str]) -> DataFrame:
    """Distinct on entity columns (``DropDuplicateEntities``,
    ``retrieval_job.py:2110-2129``)."""
    return df.dropDuplicates(entities)


def unique_rows(
    df: DataFrame,
    keys: list[str],
    sort_key: str,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Latest-row-wins per key (``UniqueRowsJob``,
    ``retrieval_job.py:2437-2461``).

    Deterministic ``row_number`` window — the reference's own Spark
    sketch used ``sort().dropDuplicates()`` which is NOT deterministic
    under Spark's partitioned execution (SURVEY §2.2 flags this).
    ``tie_break`` orders equal sort-key rows by a second column so the
    pick is reproducible even with timestamp collisions.
    """
    order = [F.col(sort_key).desc() if descending else F.col(sort_key).asc()]
    if tie_break is not None:
        order.append(
            F.col(tie_break).desc() if descending else F.col(tie_break).asc()
        )
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def limit(df: DataFrame, n: int | None) -> DataFrame:
    """Head N (``LimitJob``, ``retrieval_job.py:2056-2075``)."""
    return df if n is None else df.limit(n)


def ensure_types(df: DataFrame, schema: Mapping[str, FeatureType]) -> DataFrame:
    """Cast every declared column to the contract dtype
    (``EnsureTypesJob``, ``retrieval_job.py:2865-2955``).

    String → array/embedding columns decode via ``from_json`` (the
    reference json-decodes strings for list types); bool goes via
    int-ish cast semantics Spark already handles natively.
    """
    casts: dict[str, Column] = {}
    existing = dict(df.dtypes)
    for name, ftype in schema.items():
        if name not in existing:
            continue
        target = ftype.spark_type
        current = df.schema[name].dataType
        if current == target:
            continue
        if ftype.is_array and existing[name] == "string":
            casts[name] = F.from_json(F.col(name), target)
        else:
            casts[name] = F.col(name).cast(target)
    return df.withColumns(casts) if casts else df


def fill_missing_columns(
    df: DataFrame, defaults: Mapping[str, tuple[Any, FeatureType]]
) -> DataFrame:
    """Add absent optional/defaulted columns as typed literals
    (``FillMissingColumnsJob``, ``retrieval_job.py:2487-2538``)."""
    additions = {
        name: F.lit(default).cast(ftype.spark_type)
        for name, (default, ftype) in defaults.items()
        if name not in df.columns
    }
    return df.withColumns(additions) if additions else df


def unpack_embeddings(
    df: DataFrame,
    columns: Mapping[str, int | None] | list[str],
    prefix_sep: str = "_",
) -> DataFrame:
    """Widen embedding ``array`` columns into one scalar column per
    dimension — ``emb`` → ``emb_0 .. emb_{d-1}`` — the classical-ML
    feature-widening step (``UnpackEmbedding``,
    ``retrieval_job.py:3297-3318``: polars list→struct with the
    max-width strategy, then unnest).

    ``columns`` maps column → dimension; a ``None`` (or list form)
    probes ``max(size(col))`` in ONE aggregate over all unsized
    columns. The unpack itself is a pure codegen projection
    (``col[i]`` element_at per dimension — no explode, no UDF, no
    shuffle), so it scales as a map-only pass; rows whose array is
    shorter than the width project NULL for the missing tail, same
    as the reference's max-width struct.

    A probed width of 0 (empty input, or every array NULL/empty)
    raises instead of silently dropping the column: the output
    schema must not be data-dependent — an empty incremental batch
    would otherwise lose its feature columns. Pass the expected
    dimension explicitly for inputs that can be empty."""
    if not isinstance(columns, Mapping):
        columns = {c: None for c in columns}
    unsized = [c for c, d in columns.items() if d is None]
    widths = dict(columns)
    if unsized:
        row = df.agg(
            *[
                F.max(F.size(F.col(c))).alias(c)
                for c in unsized
            ]
        ).first()
        for c in unsized:
            w = row[c]
            # size(NULL) = -1, so all-NULL probes come back negative
            if w is None or int(w) <= 0:
                raise ValueError(
                    f"unpack_embeddings: probed width of {c!r} is "
                    f"{w} (empty input or all-NULL/empty arrays) — "
                    "the output schema would become data-dependent; "
                    "pass an explicit width for this column"
                )
            widths[c] = int(w)
    for c, w in widths.items():
        if int(w) <= 0:
            raise ValueError(
                f"unpack_embeddings: width {w} for {c!r} must be "
                "positive (a zero width silently drops the column)"
            )
    out_cols: list[Column] = []
    for name in df.columns:
        if name in widths:
            out_cols.extend(
                F.col(name)[i].alias(f"{name}{prefix_sep}{i}")
                for i in range(int(widths[name]))
            )
        else:
            out_cols.append(F.col(name))
    return df.select(*out_cols)


def validate_entities(df: DataFrame, entities: list[str]) -> DataFrame:
    """Empty result when an entity column is missing
    (``ValidateEntitiesJob``, ``retrieval_job.py:2464-2484``) — a
    schema-only check, no job runs."""
    if all(e in df.columns for e in entities):
        return df
    return df.sparkSession.createDataFrame([], df.schema)


def derive(
    df: DataFrame,
    features: Mapping[str, Expr | Column],
    intermediate: Iterable[str] = (),
) -> DataFrame:
    """Compute derived features in topological rounds
    (``DerivedFeatureJob``, ``retrieval_job.py:2313-2434``; round order
    ``retrieval_request.py:204-231``), then drop intermediates.

    Rounds are resolved here from the reference graph: a feature whose
    expression mentions another *derived* name waits for that name's
    round. Each round is a single ``withColumns`` — Catalyst collapses
    consecutive projections, so rounds are free at execution time.
    """
    from aligned_spark.expr import Multi

    # expand Multi transformations: each step becomes a derived column
    # (intermediates dropped afterwards), the last step takes the
    # feature's own name (`MultiTransformation:3194`, hidden-feature
    # compilation `feature_view.py:906-933`)
    expanded: dict[str, Expr | Column] = {}
    multi_intermediates: list[str] = []
    for name, e in features.items():
        if isinstance(e, Multi):
            if not e.steps:
                raise ValueError(f"Multi feature {name!r} has no steps")
            for alias, step_expr in e.steps[:-1]:
                expanded[alias] = step_expr
                multi_intermediates.append(alias)
            expanded[name] = e.steps[-1][1]
        else:
            expanded[name] = e
    features = expanded
    intermediate = list(intermediate) + multi_intermediates

    available = set(df.columns)
    pending = dict(features)
    while pending:
        round_exprs: dict[str, Column] = {}
        for name, e in list(pending.items()):
            refs = e.references() if isinstance(e, Expr) else set()
            blocked = {r for r in refs if r in pending and r != name}
            if not blocked:
                round_exprs[name] = e.to_spark() if isinstance(e, Expr) else e
                del pending[name]
        if not round_exprs:
            raise ValueError(
                f"cyclic or unresolvable derived features: {sorted(pending)}"
            )
        df = df.withColumns(round_exprs)
        available |= set(round_exprs)
    drop = [c for c in intermediate if c in df.columns]
    return df.drop(*drop) if drop else df


def apply_pandas(
    df: DataFrame,
    fn,
    output_schema,
) -> DataFrame:
    """DataFrame-level pandas escape hatch
    (``PandasLambdaTransformation:1327`` /
    ``PandasFunctionTransformation:1267``) executed via Arrow-batched
    ``mapInPandas`` — whole batches cross the JVM↔Python boundary,
    never rows.

    ``fn``: ``pd.DataFrame -> pd.DataFrame`` (must produce columns
    matching ``output_schema``). The declared schema keeps Catalyst
    planning downstream operators normally."""

    def _run(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_run, schema=output_schema)


def apply_pandas_column(
    df: DataFrame,
    fn,
    output_col: str,
    output_type: "FeatureType | str",
) -> DataFrame:
    """Append ONE pandas-computed column (``PandasTransform`` holder,
    ``@transform_pandas`` decorator surface): ``fn`` gets the full
    batch as a pandas DataFrame and returns a Series."""
    from pyspark.sql.types import StructField, StructType

    from aligned_spark.types import FeatureType as FT

    ftype = FT(output_type) if isinstance(output_type, str) else output_type
    spark_t = ftype.spark_type
    out_schema = StructType(
        list(df.schema.fields) + [StructField(output_col, spark_t, True)]
    )

    def _run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[output_col] = fn(pdf)
            yield pdf

    return df.mapInPandas(_run, schema=out_schema)


def stack(
    dfs: list[DataFrame],
    source_column: str | None = None,
    source_names: list[str] | None = None,
) -> DataFrame:
    """Union by name on the top frame's column set (``StackJob``,
    ``retrieval_job.py:1748-1792``; provenance column
    ``StackSourceColumn:1741``)."""
    if not dfs:
        raise ValueError("stack requires at least one frame")
    tagged = []
    for i, df in enumerate(dfs):
        if source_column is not None:
            name = source_names[i] if source_names else str(i)
            df = df.withColumn(source_column, F.lit(name))
        tagged.append(df)
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (absent in the reference — SURVEY §2.6 notes
    Spark gives it free; exposed for API completeness)."""
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Multiset difference (``exceptAll``) — bag semantics, keeps
    duplicate multiplicity."""
    return a.exceptAll(b)


def cached(df: DataFrame) -> DataFrame:
    """In-memory(+disk) cache (``InMemoryCacheJob``,
    ``retrieval_job.py:1683``)."""
    from pyspark.storagelevel import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)


def file_cached(df: DataFrame, source, spark=None) -> DataFrame:
    """Parquet spill-cache (``FileCachedJob``,
    ``retrieval_job.py:2775``): read the checkpoint if it exists, else
    compute, write, and read back — cutting the upstream lineage for
    downstream plans."""
    spark = spark or df.sparkSession
    try:
        return source.read(spark)
    except Exception:
        source.overwrite(df)
        return source.read(spark)


def logged(df: DataFrame, log_fn=print, label: str = "") -> DataFrame:
    """Diagnostics pass-through (``LogJob``, ``retrieval_job.py:2193``):
    logs the schema and the optimized plan WITHOUT triggering a job —
    a count here would add a full extra action at 100 TB."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    log_fn(f"[{label}] schema: {df.schema.simpleString()}")
    log_fn(f"[{label}] plan:\n{plan}")
    return df


def timed(df: DataFrame, callback, label: str = "") -> DataFrame:
    """Wall-clock a materialization (``TimeMetricLoggerJob`` /
    ``monitor_time_used``, ``retrieval_job.py:1086,2843``): forces
    the frame ONCE (cache + count — the cache keeps the paid compute
    for the caller), reports elapsed seconds to ``callback(seconds)``
    (or ``callback(seconds, label)`` if it takes two), and returns
    the cached frame. Spark is lazy, so unlike the reference's eager
    jobs this is an explicit boundary the caller opts into."""
    import time as _time

    from pyspark.storagelevel import StorageLevel

    t0 = _time.time()
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    elapsed = _time.time() - t0
    try:
        callback(elapsed, label)
    except TypeError:
        callback(elapsed)
    return out


def chunked(df: DataFrame, size: int):
    """Driver-side chunk iterator (``DataLoaderJob`` via
    ``.chunked(size)``, ``retrieval_job.py:894``): yields pandas
    frames of at most ``size`` rows — the feed-an-API / write-in-
    batches escape hatch. Streams through ``toLocalIterator`` so at
    most one partition (plus the pending chunk) is ever resident on
    the driver; the cluster-side plan is untouched."""
    if size <= 0:
        raise ValueError("chunk size must be positive")
    import pandas as pd

    cols = df.columns
    buf: list = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) == size:
            yield pd.DataFrame.from_records(buf, columns=cols)
            buf = []
    if buf:
        yield pd.DataFrame.from_records(buf, columns=cols)


def with_loaded_at(df: DataFrame, column: str = "loaded_at") -> DataFrame:
    """Append a load-timestamp column (``LoadedAtSource``,
    ``batch_data_source.py:1289``; ``LoadedAtJob`` ``retrieval_job.py:2733``)."""
    return df.withColumn(column, F.current_timestamp())


def encode_dates(df: DataFrame, columns: list[str], fmt: str | None = None) -> DataFrame:
    """Timestamp columns → formatted strings (``EncodeDatesJob:1622``;
    ``StringDateFormatter.encode_polars``, ``date_formatter.py:121-125``).
    ``fmt`` accepts either a Spark datetime pattern or the reference's
    chrono ``%``-style pattern (translated)."""
    if fmt and "%" in fmt:
        fmt = chrono_to_spark_format(fmt)
    exprs = {
        c: F.date_format(F.col(c), fmt or "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        for c in columns
        if c in df.columns
    }
    return df.withColumns(exprs) if exprs else df


#: chrono (Rust / reference ``date_formatter.py``) → JDK datetime tokens.
#: Ordered longest-first so ``%.f`` wins over ``%f``; unknown tokens raise.
_CHRONO_TOKENS = [
    ("%.f", ".SSSSSS"),
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%e", "d"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%j", "DDD"),
    ("%A", "EEEE"),
    ("%a", "EEE"),
    ("%B", "MMMM"),
    ("%b", "MMM"),
    ("%T", "HH:mm:ss"),
    ("%Z", "XXX"),
    ("%z", "XXX"),
    ("%%", "%"),
]


def chrono_to_spark_format(fmt: str) -> str:
    """Translate the reference's chrono-style date format (``%Y-%m-%d``,
    ``StringDateFormatter.date_format``, ``date_formatter.py:107``) into
    the equivalent JDK/Spark pattern. Literal runs that contain JDK
    pattern letters are quoted so e.g. the ``T`` in ISO-8601 survives.
    Unknown ``%`` tokens raise — silent passthrough would parse wrong."""
    out: list[str] = []
    i = 0
    lit: list[str] = []

    def flush() -> None:
        if lit:
            run = "".join(lit)
            if any(ch.isalpha() for ch in run):
                run = "'" + run.replace("'", "''") + "'"
            out.append(run)
            lit.clear()

    while i < len(fmt):
        if fmt[i] == "%":
            for tok, repl in _CHRONO_TOKENS:
                if fmt.startswith(tok, i):
                    flush()
                    out.append(repl)
                    i += len(tok)
                    break
            else:
                raise ValueError(f"unsupported chrono token at {fmt[i:i+3]!r} in {fmt!r}")
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


_EPOCH_UNITS = (None, "s", "ms", "us", "micros", "ns")


def encode_epoch(df: DataFrame, columns: list[str], unit: str = "us") -> DataFrame:
    """Timestamp columns → epoch integers (``Timestamp.encode_polars``,
    ``date_formatter.py:102-104``; units s/ms/us/ns). The ``ns`` encode
    is ``micros * 1000`` — Spark timestamps carry microsecond
    precision, same as the reference's polars ``us`` default."""
    if unit not in _EPOCH_UNITS:
        raise ValueError(f"unknown epoch unit {unit!r}")
    def enc(c: Column) -> Column:
        if unit in (None, "s"):
            return F.unix_timestamp(c)
        if unit == "ms":
            return F.unix_millis(c)
        if unit in ("us", "micros"):
            return F.unix_micros(c)
        return F.unix_micros(c) * F.lit(1000)
    exprs = {c: enc(F.col(c)) for c in columns if c in df.columns}
    return df.withColumns(exprs) if exprs else df


def decode_timestamps(
    df: DataFrame, columns: Mapping[str, str | None]
) -> DataFrame:
    """Decode raw timestamp encodings to TimestampType
    (reference ``local/job.py:169-214`` + the ``DateFormatter`` family,
    ``schemas/date_formatter.py:90-125``): unix epoch ints
    (s/ms/us/ns — ``Timestamp``), ISO strings (``NoopFormatter`` /
    default ``to_timestamp``), or an explicit date format per column
    (``StringDateFormatter``; chrono ``%``-patterns translated via
    :func:`chrono_to_spark_format`). tz-naive treated as UTC (session
    tz is pinned UTC; the reference's ``time_zone`` arg).

    ``ns`` decode stays integral — ``DIV 1000`` on the long, never a
    float divide (epoch nanos exceed a double's 2^53 mantissa)."""
    exprs: dict[str, Column] = {}
    for name, unit in columns.items():
        if name not in df.columns:
            continue
        dtype = dict(df.dtypes)[name]
        c = F.col(name)
        if dtype.startswith("timestamp"):
            continue
        if dtype in ("bigint", "int", "long", "double", "float"):
            if unit in (None, "s"):
                exprs[name] = F.timestamp_seconds(c)
            elif unit == "ms":
                exprs[name] = F.timestamp_millis(c.cast("long"))
            elif unit in ("us", "micros"):
                exprs[name] = F.timestamp_micros(c.cast("long"))
            elif unit == "ns":
                quoted = name.replace("`", "``")
                exprs[name] = F.timestamp_micros(
                    F.expr(f"CAST(`{quoted}` AS BIGINT) DIV 1000")
                )
            else:
                raise ValueError(f"unknown timestamp unit {unit!r}")
        elif unit in (None, "s", "ms", "us", "micros", "ns"):
            exprs[name] = F.to_timestamp(c)
        else:
            fmt = chrono_to_spark_format(unit) if "%" in unit else unit
            exprs[name] = F.to_timestamp(c, fmt)
    return df.withColumns(exprs) if exprs else df


def resample(
    df: DataFrame,
    keys: list[str],
    ts: str,
    step_seconds: float,
    fill_cols: list[str] | None = None,
) -> DataFrame:
    """Regularize an event series: one row per ``step_seconds`` tick
    per key, from each key's first step-aligned tick through its last
    event, with ``fill_cols`` forward-filled from the latest event at
    or before the tick.

    The feature-store resampling primitive (training frames want a
    regular grid, events arrive irregularly). Shapes: the grid is a
    per-key ``sequence`` explode (flatMap — no shuffle, ~span/step
    rows per key); filling reuses the union sorted-merge as-of
    (:func:`aligned_spark.operators.joins.asof_join`), one shuffle +
    one sort on the key."""
    from pyspark.sql import functions as F

    from aligned_spark.operators.joins import asof_join

    step_us = int(step_seconds * 1_000_000)
    bounds = df.groupBy(*keys).agg(
        F.min(ts).alias("__lo"), F.max(ts).alias("__hi")
    )
    aligned_lo = F.timestamp_micros(
        F.ceil(F.unix_micros(F.col("__lo")) / F.lit(step_us)).cast("long")
        * F.lit(step_us)
    )
    # a key whose whole span precedes its first aligned tick has no
    # grid rows; filtering avoids sequence(start > stop) errors
    # Grid generated in integer micros (not INTERVAL seconds): fractional
    # steps would otherwise truncate — 0.5 s became INTERVAL 0 (error) and
    # 1.5 s produced ticks misaligned with the advertised step.
    if step_us <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    grid = (
        bounds.withColumn("__start", aligned_lo)
        .filter(F.col("__start") <= F.col("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.unix_micros(F.col("__start")),
                    F.unix_micros(F.col("__hi")),
                    F.lit(step_us),
                )
            ).alias("__tick_us"),
        )
        .select(
            *keys, F.timestamp_micros(F.col("__tick_us")).alias(ts)
        )
    )
    fill_cols = fill_cols or [
        c for c in df.columns if c not in set(keys) | {ts}
    ]
    return asof_join(
        grid,
        df.select(*keys, ts, *fill_cols),
        on=ts,
        by=keys,
    )


def resample_linear(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value_col: str,
    step_seconds: float,
) -> DataFrame:
    """:func:`resample` with LINEAR interpolation instead of forward
    fill: each grid tick's value is interpolated between the key's
    latest event at-or-before and earliest event after the tick —
    the sensor/metrics resampling rule (ffill models step functions;
    gauges want the line). Ticks after a key's last event forward-fill
    (no right endpoint to interpolate toward); a tick ON an event
    takes the event's value exactly.

    Shape: the same per-key ``sequence`` grid, then TWO sorted-merge
    as-of passes (backward + forward — each one shuffle + sort on the
    keys, cf. :func:`aligned_spark.operators.joins.asof_join`); the
    interpolation itself is exact int64-micros arithmetic lowered to
    codegen."""
    from pyspark.sql import functions as F

    from aligned_spark.operators.joins import asof_join

    if step_seconds <= 0:
        raise ValueError(f"step_seconds must be positive, got {step_seconds}")
    step_us = int(step_seconds * 1_000_000)
    bounds = df.groupBy(*keys).agg(
        F.min(ts).alias("__lo"), F.max(ts).alias("__hi")
    )
    aligned_lo = F.timestamp_micros(
        F.ceil(F.unix_micros(F.col("__lo")) / F.lit(step_us)).cast("long")
        * F.lit(step_us)
    )
    grid = (
        bounds.withColumn("__start", aligned_lo)
        .filter(F.col("__start") <= F.col("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.unix_micros(F.col("__start")),
                    F.unix_micros(F.col("__hi")),
                    F.lit(step_us),
                )
            ).alias("__tick_us"),
        )
        .select(*keys, F.timestamp_micros(F.col("__tick_us")).alias(ts))
    )
    ev = df.select(
        *keys,
        ts,
        F.col(value_col).cast("double").alias("__v"),
        F.unix_micros(F.col(ts)).alias("__t"),
    )
    back = asof_join(
        grid, ev.select(*keys, ts, F.col("__v").alias("__v0"),
                        F.col("__t").alias("__t0")),
        on=ts, by=keys,
    )
    both = asof_join(
        back, ev.select(*keys, ts, F.col("__v").alias("__v1"),
                        F.col("__t").alias("__t1")),
        on=ts, by=keys, direction="forward",
    )
    t = F.unix_micros(F.col(ts))
    frac = (t - F.col("__t0")).cast("double") / (
        F.col("__t1") - F.col("__t0")
    ).cast("double")
    interp = F.when(
        F.col("__t1").isNull() | (F.col("__t1") == F.col("__t0")),
        F.col("__v0"),
    ).otherwise(F.col("__v0") + (F.col("__v1") - F.col("__v0")) * frac)
    return both.select(*keys, ts, interp.alias(value_col))


def lag_features(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value_cols: list[str],
    tie_cols: list[str] | None = None,
    gap_col: str = "gap_us",
) -> DataFrame:
    """Per-key previous-event deltas — the classic sequence
    feature-engineering primitive (time-since-last-event, value change
    since last observation) that turns an event log into model inputs.

    Adds ``{gap_col}`` (microseconds since the key's previous event,
    NULL for each key's first row) and ``{v}_delta`` per value column
    (current − previous, NULL for the first row). Ordering is
    ``(ts, *tie_cols)`` — pass a unique tiebreaker so results are
    deterministic under equal timestamps.

    Scale shape: ONE shuffle on ``keys`` + one sort feeds every lag
    (Spark fuses same-spec window functions into a single WindowExec);
    no state beyond one preceding row per function. Gap math is exact
    int64 micros (no float timestamps)."""
    from pyspark.sql import Window as W

    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    us = F.unix_micros(F.col(ts))
    out = df.withColumn(gap_col, us - F.lag(us).over(w))
    for v in value_cols:
        out = out.withColumn(
            f"{v}_delta", F.col(v) - F.lag(F.col(v)).over(w)
        )
    return out


def global_row_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous 0-based row ids in total ``order_cols`` order —
    WITHOUT the single-task plan Spark gives a global window
    (``row_number().over(Window.orderBy(...))`` funnels every row
    through ONE task; WindowExec warns and then does exactly that).

    The training-data sharding primitive: stable example ids for a
    packed corpus, resumable iteration offsets, deterministic
    shuffling seeds.

    Two-phase formulation (the textbook distributed rank):

    1. range-repartition on ``order_cols`` and sort within each
       partition — Spark's own TakeOrderedAndProject machinery,
       parallelism = ``num_partitions``;
    2. count rows per partition (a tiny aggregate), prefix-sum the
       counts on the driver (one row per partition), broadcast the
       offsets, and add ``offset + local position`` in a streaming
       ``mapInPandas`` pass that never materializes a partition.

    The frame is persisted between the two phases — REQUIRED for
    correctness, not a cache nicety: the range partitioner samples
    its split points, so an unpersisted recompute between the count
    job and the id job could draw different boundaries and mis-align
    the offsets.

    ``order_cols`` must be a total order (add a unique tiebreak
    column); with ties the ids of tied rows are arbitrary within the
    tie group. Ids equal ``row_number() OVER (ORDER BY order_cols)
    - 1`` regardless of partition boundaries."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        df.repartitionByRange(n, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = parted.groupBy("__pid").count().collect()
    offsets: dict[int, int] = {}
    run = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[int(row["__pid"])] = run
        run += int(row["count"])
    b_offsets = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        df.schema.fields + [StructField(id_col, LongType(), False)]
    )

    def _assign(batches):
        base = None
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = b_offsets.value[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[id_col] = np.arange(
                base + seen, base + seen + len(pdf), dtype=np.int64
            )
            seen += len(pdf)
            yield pdf

    return parted.mapInPandas(_assign, out_schema)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data capture between two table snapshots: one row per
    key present in either side, tagged ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` (null-safe column comparison).

    The reconciliation primitive behind incremental re-materialization
    audits and upsert verification. Shape: ONE full-outer equi join —
    both sides hash-partition on the keys; comparisons are codegen.
    Output: key columns + ``change_type``."""
    compare_cols = compare_cols or [
        c for c in old.columns if c not in keys and c in new.columns
    ]
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, on=keys, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, change.alias("change_type"))


def ewma_features(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value_col: str,
    alpha: float = 0.2,
    lookback: int = 64,
    tie_cols: list[str] | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially-weighted moving average of
    ``value_col`` — the smoothed-history feature (recent behavior
    weighted over stale) every event-sequence model wants next to
    :func:`lag_features`'s raw deltas:

        ewma_t = Σ_{j=0..m} (1−α)^j · x_{t−j} / Σ_{j=0..m} (1−α)^j,
        m = min(t, lookback)

    — pandas ``ewm(alpha, adjust=True)`` semantics, TRUNCATED at
    ``lookback`` rows so the per-row state is bounded by contract
    (at the default α=0.2, the dropped tail's weight is
    (1−α)^65 < 5·10⁻⁷ of the total). Weights are positional, so NULL
    values cannot be silently skipped: any row whose frame contains a
    NULL (including its own) gets a NULL ewma — visible, never
    mis-weighted. Pre-filter NULL rows to score the dense history
    instead.

    Scale shape: one shuffle on ``keys`` + one sort; the bounded
    ROWS-frame ``collect_list`` holds ≤ lookback+1 doubles per row —
    no whole-partition buffering, unlike an unbounded running
    formulation. The weighted fold runs SEQUENTIALLY over the frame
    with power-of-(1−α) literals, so the float result is bit-identical
    to any engine replaying the same fold (no rounding tolerance).
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-lookback, W.currentRow)
    )
    powers, p = [], 1.0
    for _ in range(lookback + 1):
        powers.append(p)
        p *= 1.0 - alpha
    plit = F.lit(powers)
    arr = F.collect_list(F.col(value_col).cast("double")).over(w)
    # collect_list silently DROPS nulls — compare against the frame's
    # row count so a frame containing any NULL yields a NULL ewma
    # instead of positionally mis-weighted values; the count also
    # guards the all-null frame (n=0, where sequence(1,0) would
    # descend into element_at(plit, 0) and throw)
    out = df.withColumn("__arr", arr).withColumn(
        "__frame_n", F.count(F.lit(1)).over(w)
    )
    n = F.size("__arr")
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))

    def _fold(body):
        return F.aggregate(idx, F.lit(0.0), body)

    num = _fold(
        lambda acc, i: acc
        + F.element_at("__arr", i) * F.element_at(plit, n - i + 1)
    )
    den = _fold(lambda acc, i: acc + F.element_at(plit, n - i + 1))
    ewma = F.when(
        (n > 0) & (n == F.col("__frame_n")), num / den
    ).otherwise(F.lit(None).cast("double"))
    return out.withColumn(out_col, ewma).drop("__arr", "__frame_n")


_CROSS_P = 2_147_483_647  # 2^31 − 1: acc·B + ch stays < 2^62 (int64-safe)
_CROSS_CHAR_B = 31
_CROSS_COMB_B = 1_000_003


def feature_cross(
    df: DataFrame,
    cols: list[str],
    buckets: int,
    out_col: str = "cross_bucket",
) -> DataFrame:
    """Hashed interaction feature ("feature cross", the wide-model /
    recsys staple): the combination of ``cols`` folds into one of
    ``buckets`` ids — categorical interactions without materializing
    the cross-product vocabulary.

    Each value casts to its string form and char-folds under the
    Mersenne-31 polynomial (NULL folds as the empty string — one
    reserved stream distinct from the text '0'); the per-column
    hashes then combine order-sensitively, so cross(a,b) ≠ cross(b,a).
    Entirely codegen int64 arithmetic — no UDF, no shuffle, and
    exactly replayable in portable SQL (unlike xxhash64; the 2^31−1
    modulus keeps every intermediate under 2^62).

    Collisions are the accepted price of hashing (rate ≈ n²/2m as in
    any hashed-embedding table); pick ``buckets`` ≥ the square of the
    expected distinct-combination count for near-perfect separation.
    """
    if buckets <= 0:
        raise ValueError("buckets must be positive")

    def _char_fold(c: str) -> Column:
        chars = F.split(
            F.coalesce(F.col(c).cast("string"), F.lit("")), ""
        )
        return F.aggregate(
            F.filter(chars, lambda ch: ch != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, ch: (
                acc * F.lit(_CROSS_CHAR_B) + F.ascii(ch)
            ) % F.lit(_CROSS_P),
        )

    combined = F.lit(0).cast("long")
    for c in cols:
        combined = (
            combined * F.lit(_CROSS_COMB_B) + _char_fold(c)
        ) % F.lit(_CROSS_P)
    return df.withColumn(out_col, combined % F.lit(int(buckets)))
