"""Corpus-quality signals that need aggregation (not just a column
expression).

Complements the per-document column functions in
:mod:`aligned_spark.functions.text` (quality_score, line_dup_ratio,
language_id): the operators here explode to sub-document granularity
and aggregate back, so they are DataFrame→DataFrame.

Reference capability surface: the aligned reference has no corpus-QC
operators; these extend the engine for LLM training-data pipelines
(BASELINE north-star), following the Gopher (Rae et al. 2021)
repetition-removal rules.

Scale design (100 TB): explode→count→ratio is two shuffles keyed on
(doc, gram) then (doc) — both embarrassingly parallel, partial
(map-side) aggregation applies to each, and no per-doc state ever
exceeds the doc's own n-gram count. No UDFs, no windows, no global
sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aligned_spark.functions.text import _sliding_zip, _words


def histogram(
    df: DataFrame,
    value_col: str,
    bin_width: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col`` (optionally per ``keys``
    group): rows ``(keys..., bin_lo, bin_count)`` where ``bin_lo`` is
    the inclusive lower edge of the bin containing the value. Nulls
    are excluded.

    The profiling primitive for corpus/dataset QC (token-length
    distributions, score distributions) as one floor-division +
    group-by: map-side partial aggregation means each executor ships
    at most (#groups × #occupied-bins) rows to the shuffle, regardless
    of input size."""
    keys = keys or []
    b = F.lit(float(bin_width))
    bin_lo = (F.floor(F.col(value_col) / b) * b).alias("bin_lo")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bin_lo)
        .agg(F.count(F.lit(1)).alias("bin_count"))
    )


def top_ngram_fraction(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    n: int = 2,
) -> DataFrame:
    """Gopher repetition rule: per document, the fraction of all word
    ``n``-gram occurrences taken by the single most frequent one
    (Rae et al. 2021 drop docs with top-2-gram fraction > 0.2).

    Documents with fewer than ``n`` words have no ``n``-grams and are
    excluded from the output (no signal ≠ signal 0). Counts are NOT
    distinct-ed: repetition is exactly what we're measuring, so
    :func:`~aligned_spark.functions.text.word_shingles` (distinct)
    does not apply here."""
    words = _words(F.col(text_col))
    windows = _sliding_zip(words, n)
    grams = F.transform(
        windows,
        lambda s: F.concat_ws(" ", *[s.getField(str(k)) for k in range(n)]),
    )
    ex = df.filter(F.size(words) >= n).select(
        *id_cols, F.explode(grams).alias("__g")
    )
    cnt = ex.groupBy(*id_cols, "__g").agg(F.count(F.lit(1)).alias("__c"))
    return cnt.groupBy(*id_cols).agg(
        (F.max("__c").cast("double") / F.sum("__c")).alias("top_ngram_frac")
    )
