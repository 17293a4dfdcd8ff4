"""Deterministic corpus sampling — training-mixture construction.

A 100 TB pretraining corpus is never used whole: each source/domain
gets a mixture weight ("2 epochs of wiki, 30% of crawl"). Doing that
with ``df.sample`` is non-reproducible across runs and partition
layouts; the operators here hash a stable row key into [0, 1) with the
same multiplicative-hash coordinate the keyed train/test split uses
(``operators/splits.py``), so the sample is stable under re-runs,
repartitioning, AND schema additions — and exactly replayable in SQL
(the driver oracle does).

The reference has no sampling operator (``aligned``'s only sampling
is the random dummy store); this extends the training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from aligned_spark.operators.splits import _MULT_A, _MULT_BUCKETS


def _require_int_keys(df: DataFrame, key_cols: list[str]) -> None:
    """Non-integer keys cast("long") to NULL inside the hash → NULL
    coordinate → the row fails every filter and silently vanishes
    from the sample. Fail loudly at the DataFrame-level entry points
    (``hash_coordinate`` itself is a Column builder, no schema)."""
    dtypes = dict(df.dtypes)
    bad = [
        c for c in key_cols
        if dtypes.get(c) not in ("tinyint", "smallint", "int", "bigint", "long")
    ]
    if bad:
        raise TypeError(
            f"key_cols must be integer columns; got "
            f"{[(c, dtypes.get(c)) for c in bad]} "
            f"(hash a surrogate key first)"
        )


def hash_coordinate(key_cols: list[str], seed: int = 0) -> Column:
    """Stable [0, 1) coordinate from integer key columns — exact
    int64 arithmetic (h = ((h + col) mod 2^30) · A mod 2^30), exact
    double division (2^30 divides exactly)."""
    h = F.lit(seed).cast("long")
    for c in key_cols:
        h = F.pmod(
            F.pmod(h + F.col(c).cast("long"), F.lit(_MULT_BUCKETS))
            * F.lit(_MULT_A),
            F.lit(_MULT_BUCKETS),
        )
    return h.cast("double") / F.lit(float(_MULT_BUCKETS))


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Stateless and
    shuffle-free (a filter over the scan), reproducible everywhere."""
    _require_int_keys(df, key_cols)
    return df.filter(hash_coordinate(key_cols, seed) < F.lit(fraction))


def pack_documents(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    token_col: str,
    budget: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (sequence packing
    for pretraining): in deterministic ``order_col`` order within each
    ``keys`` partition, a document joins the current pack while the
    running token total stays under ``budget`` — i.e. streaming
    first-fit in a stable order, the standard scalable approximation
    of bin packing (optimal packing is NP-hard and inherently
    sequential).

    ``pack_id = floor((running_total − tokens) / budget)``: one window
    cumsum, no state, no UDF; parallelism = #keys (pack within
    source/shard — exactly how corpus packing shards at 100 TB).
    Documents larger than the budget get a pack to themselves (the
    cumsum jump skips intermediate ids, it never merges neighbors)."""
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        pack_col,
        F.floor((running - F.col(token_col)) / F.lit(budget)).cast("long"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    overlap: int = 0,
    chunk_col: str = "chunk",
    idx_col: str = "chunk_idx",
    start_col: str = "chunk_start",
) -> DataFrame:
    """Split documents into fixed-size character chunks with
    ``overlap`` characters shared between consecutive chunks — the
    RAG/embedding-prep primitive (context windows are bounded; retrieval
    wants sub-document granularity with overlap so no span straddles a
    boundary unseen).

    Chunk ``k`` covers ``[k·step, k·step + chunk_size)`` with
    ``step = chunk_size − overlap``; the last chunk may be shorter;
    empty documents produce no chunks. ``{start_col}`` is the 1-based
    character offset (SQL ``substr`` convention).

    Scale shape: a pure codegen ``posexplode(sequence(...))`` +
    ``substr`` — a flatMap over the scan, no shuffle, no UDF; output
    row size is bounded by ``chunk_size`` regardless of document
    length, so downstream partitions stay balanced even when the
    corpus has multi-MB outlier documents."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"overlap must be in [0, chunk_size), got {overlap}"
        )
    step = chunk_size - overlap
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(0), F.length(text) - F.lit(1), F.lit(step)
    )
    others = [c for c in df.columns if c not in (id_col, text_col)]
    return (
        df.filter(F.length(text) > 0)
        .select(
            id_col,
            *others,
            F.posexplode(starts).alias(idx_col, "__start"),
            text.alias("__text"),
        )
        .select(
            id_col,
            *others,
            F.col(idx_col).cast("long").alias(idx_col),
            (F.col("__start") + F.lit(1)).cast("long").alias(start_col),
            F.col("__text")
            .substr(F.col("__start") + F.lit(1), F.lit(chunk_size))
            .alias(chunk_col),
        )
    )


def filter_by_quantile(
    df: DataFrame,
    keys: list[str],
    score_col: str,
    keep_top: float,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the best ``keep_top`` fraction of rows per ``keys`` group
    by ``score_col`` (relative quality filtering — "keep the top 30%
    of each source by quality score", the standard way to apply a
    quality model without hand-picking absolute thresholds per
    domain).

    ``percent_rank`` over (keys | score desc, tie_cols): exact rank
    arithmetic, deterministic given a tie-break, so the cut is
    reproducible and SQL-replayable. Parallelism = #groups; at 100 TB
    group by source/domain (low cardinality), never by a unique key."""
    order = [F.col(score_col).desc()] + [
        F.col(c).asc() for c in (tie_cols or [])
    ]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__pr", F.percent_rank().over(w))
        .filter(F.col("__pr") <= keep_top)
        .drop("__pr")
    )


def weighted_source_sample(
    df: DataFrame,
    key_cols: list[str],
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-source mixture sampling: keep a row when its key hash falls
    under its source's weight. Sources absent from ``weights`` keep
    ``default_weight`` (0 = drop). Still a pure filter — no shuffle,
    no state; weights are plan literals so Catalyst folds the CASE."""
    _require_int_keys(df, key_cols)
    thr: Column = F.lit(float(default_weight))
    for src, w in sorted(weights.items()):
        thr = F.when(F.col(source_col) == src, F.lit(float(w))).otherwise(thr)
    return df.filter(hash_coordinate(key_cols, seed) < thr)


def temperature_sample(
    df: DataFrame,
    source_col: str,
    key_cols: list[str],
    alpha: float,
    target_rows: int,
    seed: int = 0,
) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual
    α-sampling recipe: sample source ``s`` with probability
    ``p_s^α / Σ p^α``, α<1 upweights low-resource sources): draw
    ~``target_rows`` total with per-source keep-fraction
    ``min(1, target·q_s / n_s)`` over the stable hash coordinate —
    deterministic, re-runnable, SQL-replayable.

    Shape: one map-side-partial count to (#sources) rows computed on
    the driver (sources are low-cardinality by definition), folded
    into a literal CASE threshold → the sample is a pure scan filter,
    no shuffle, no join. Fractions are epsilon-rounded to 6 decimals
    so the transcendental ``pow`` cannot flip a row across engines."""
    _require_int_keys(df, key_cols)
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[0] is not None
    }
    total = sum(counts.values())
    if not total:
        return df.filter(F.lit(False))
    probs = {s: n / total for s, n in counts.items()}
    z = sum(p ** alpha for p in probs.values())
    import math

    fracs = {
        s: math.floor(
            min(1.0, target_rows * (probs[s] ** alpha / z) / counts[s])
            * 1e6 + 0.5 + 1e-9
        )
        / 1e6
        for s in counts
    }
    thr: Column = F.lit(0.0)
    for s, f in sorted(fracs.items()):
        thr = F.when(F.col(source_col) == s, F.lit(f)).otherwise(thr)
    return df.filter(hash_coordinate(key_cols, seed) < thr)


def weighted_reservoir_k(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    weight_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(k, n)``
    rows per group, each row's inclusion probability proportional to
    its weight — Efraimidis–Spirakis A-ES: every row draws an
    exponential race key ``−ln(u)/w`` and the ``k`` smallest win.
    The deterministic complement of :func:`weighted_source_sample`
    (which takes a Bernoulli *fraction* per source): "give me 100k
    docs per domain, long documents proportionally more often".

    ``u`` comes from the stable multiplicative-hash coordinate (same
    family as :func:`sample_exact_k`), shifted by 2^-31 so u > 0 — so
    the sample is reproducible across runs, partitionings, and
    engines; the race key is epsilon-rounded to 6 decimals with a
    ``key_cols`` tiebreak so cross-engine ln() last-ulp differences
    cannot reorder the cut (weights are assumed O(1)–O(1e6); rows
    with NULL or non-positive weight are excluded). Scale contract
    as :func:`sample_exact_k`'s naive path: rank within each group —
    group by low-cardinality categories; compose with its pre-filter
    trick if groups are corpus-sized."""
    _require_int_keys(df, key_cols)
    u = hash_coordinate(key_cols, seed) + F.lit(2.0 ** -31)
    w = F.col(weight_col).cast("double")
    key = -F.log(u) / w
    key_r6 = (
        F.floor(key * F.lit(1e6) + F.lit(0.5) + F.lit(1e-9)).cast("double")
        / F.lit(1e6)
    )
    win = W.partitionBy(group_col).orderBy(
        F.col("__key").asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.filter(w > 0)
        .withColumn("__key", key_r6)
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__key", "__rn")
    )


def sample_exact_k(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    k: int,
    seed: int = 0,
    oversample: float = 4.0,
) -> DataFrame:
    """Exactly ``min(k, group_size)`` rows per group, chosen as the k
    smallest stable hash coordinates — a deterministic, re-runnable
    reservoir sample ("give me 100k docs per domain").

    Scale path (the naive plan — rank every row with a window — sorts
    the full 100 TB corpus inside each group partition):

    1. per-group counts via map-side-partial ``groupBy().count()``
       (result rows = #groups, tiny);
    2. broadcast an acceptance threshold ``oversample·k/n`` per group
       and PRE-FILTER on the hash coordinate: a shuffle-free scan
       filter that keeps ~``oversample·k`` rows per group;
    3. rank only the survivors (window input is ~groups·oversample·k
       rows, not the corpus);
    4. EXACTNESS RESCUE: a group that (with probability
       ≈ exp(-k·oversample²/8), i.e. never for real k) kept fewer
       than min(k, n) survivors is re-ranked without the pre-filter,
       so the result is exact regardless of luck.

    The output is identical to the naive full rank: the k smallest
    ``(coordinate, key_cols)`` per group — which is what the SQL
    oracle replays."""
    _require_int_keys(df, key_cols)
    coord = hash_coordinate(key_cols, seed)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = F.when(
        F.col("__n") <= F.lit(float(oversample * k)), F.lit(2.0)
    ).otherwise(F.lit(float(oversample * k)) / F.col("__n"))
    pre = (
        df.withColumn("__coord", coord)
        .join(
            F.broadcast(counts.select(group_col, thr.alias("__thr"))),
            on=group_col,
        )
        .filter(F.col("__coord") < F.col("__thr"))
    )
    w = W.partitionBy(group_col).orderBy("__coord", *key_cols)
    kept = (
        pre.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__thr")
    )
    # groups where the pre-filter under-delivered (kept < min(k, n))
    short = (
        kept.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__kept"))
        .join(counts, on=group_col)
        .filter(F.col("__kept") < F.least(F.lit(k), F.col("__n")))
        .select(group_col)
    )
    rescue = (
        df.join(F.broadcast(short), on=group_col, how="left_semi")
        .withColumn("__coord", coord)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    ok = kept.join(F.broadcast(short), on=group_col, how="left_anti")
    return ok.unionByName(rescue).drop("__coord")


def mixture_plan(
    token_counts: DataFrame,
    source_col: str,
    tokens_col: str,
    target_weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Data-mixture planning by TOKENS: given per-source token
    inventories and target mixture weights, derive what the sampler
    must do to hit a ``token_budget`` — per source: its token target,
    the keep-rate for downsampling, and the epoch count when the
    target EXCEEDS the inventory (upsampling, the low-resource case
    temperature mixtures hit constantly).

    Output per source present in BOTH inputs:
    ``(source, n_tokens, target_tokens, rate_ppm, epochs_ppm)`` where
    ``target_tokens = floor(w_norm · budget)`` in exact integer
    arithmetic (weights scaled to 1e6 longs — no float allocation
    drift), ``epochs_ppm = floor(target·1e6 / n)`` as a BIGINT
    (1_000_000 = one full epoch; >1e6 means repeat the source) and
    ``rate_ppm = min(1e6, epochs_ppm)`` — the keep-rate in parts per
    million. Every column is integral: the plan replays bit-for-bit
    on any engine (no double-division rounding to drift across
    DuckDB/Spark versions; divide by 1e6 at the consumer if a float
    rate is wanted).

    Scale shape: ``token_counts`` is already the per-source rollup
    (#sources rows); this is a pure projection with plan-literal
    weights — compose with :func:`weighted_source_sample` /
    :func:`deterministic_sample` to execute the plan as a scan
    filter. Reference capability: none (beyond-reference surface).
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    bad = {s: w for s, w in target_weights.items() if w < 0}
    if bad or not target_weights:
        raise ValueError(f"weights must be non-negative and non-empty: {bad}")
    wsc = {
        s: int(round(w * 1_000_000)) for s, w in target_weights.items()
    }
    wtot = sum(wsc.values())
    if wtot <= 0:
        raise ValueError("target_weights sum to zero")
    # targets are independent of the data — arbitrary-precision
    # integer floor division on the driver (a decimal-division plan
    # expression would round differently across engines; Python ints
    # never do), embedded as plan literals
    targets = {s: ws * int(token_budget) // wtot for s, ws in wsc.items()}
    tcol: Column = F.lit(None).cast("long")
    for s, t in sorted(targets.items()):
        tcol = F.when(F.col(source_col) == s, F.lit(t)).otherwise(tcol)
    n = F.col(tokens_col).cast("long")
    # exact long floor division (SQL `div`), never float `/`+floor:
    # target ≤ budget and budget·1e6 stays far under 2^63
    return (
        token_counts.filter(tcol.isNotNull() & (n > 0))
        .select(
            F.col(source_col).alias("source"),
            n.alias("n_tokens"),
            tcol.alias("target_tokens"),
            (tcol * F.lit(1_000_000).cast("long")).alias("__ts"),
        )
        .withColumn("epochs_ppm", F.expr("__ts div n_tokens"))
        .select(
            "source",
            "n_tokens",
            "target_tokens",
            F.least(F.lit(1_000_000).cast("long"), F.col("epochs_ppm"))
            .alias("rate_ppm"),
            "epochs_ppm",
        )
    )
