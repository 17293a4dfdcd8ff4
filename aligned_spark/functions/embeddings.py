"""Embedding/vector column functions.

All of these are pure higher-order-function compositions
(``F.zip_with`` / ``F.aggregate`` / ``F.transform``) — they run inside
whole-stage codegen with zero Python in the hot path, so they scale
linearly with executors. The only Pandas-UDF here is the *fake* text
embedder (the real model libs aren't in this container; the reference
uses gensim/HF via ``WordVectoriser``, ``transformation.py:2179``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def array_dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (codegen'd)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def array_norm(a: Column) -> Column:
    """L2 norm of an array<numeric> column."""
    return F.sqrt(array_dot(a, a))


def array_cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe via nullif on zero norms."""
    denominator = F.nullif(array_norm(a) * array_norm(b), F.lit(0.0))
    return array_dot(a, b) / denominator


def fake_text_embedding(text: Column, size: int = 16) -> Column:
    """Deterministic stand-in for a model text-embedder.

    Hashes character 3-shingles of the text into ``size`` buckets and
    L2-normalizes — a real (if crude) bag-of-shingles embedding that
    is fully JVM-side. Swap for an Arrow-batched pandas UDF wrapping a
    real model (sentence-transformers / API client) in production; the
    column contract (string → array<float>) is identical.
    """
    from aligned_spark.functions.text import _sliding_zip

    lowered = F.lower(F.coalesce(text, F.lit("")))
    # char array once; sliding windows via arrays_zip (a substr inside
    # a transform lambda would re-evaluate `lowered` per element, and
    # one filter per bucket would re-run the whole pipeline per bucket
    # — the two HOF traps documented in PERF.md)
    chars = F.filter(F.split(lowered, ""), lambda c: F.length(c) > 0)
    windows = _sliding_zip(chars, 3)
    buckets = F.transform(
        windows,
        lambda s: F.pmod(
            F.xxhash64(s.getField("0"), s.getField("1"), s.getField("2")),
            F.lit(size),
        ),
    )
    # single pass: fold the bucket stream into a count vector
    init = F.array_repeat(F.lit(0.0), size)

    def bump(acc, b):
        return F.transform(
            acc,
            lambda x, i: x
            + F.when(i.cast("long") == b, F.lit(1.0)).otherwise(F.lit(0.0)),
        )

    counts = F.aggregate(buckets, init, bump)
    norm = F.sqrt(
        F.aggregate(counts, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    safe_norm = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return F.transform(counts, lambda x: (x / safe_norm).cast("float"))


def word_vectorise(
    df: "DataFrame",
    text_col: str,
    output_col: str,
    model: "Callable[[list[str]], Any] | None" = None,
    dim: int = 16,
) -> "DataFrame":
    """Sentence/word embedding of a text column — the reference's
    ``WordVectoriser`` transformation (``aligned/schemas/
    transformation.py:2179-2197``; DSL ``sentence_vector`` /
    ``word_vectoriser``, ``feature_factory.py:2118-2126``): an
    injectable EMBEDDING MODEL applied batch-wise to the column.

    ``model`` is any callable ``list[str] -> iterable of float
    vectors`` and runs as an Arrow-batched pandas UDF — the same
    batch contract as the reference's ``model.vectorise_pandas``;
    plug a sentence-transformers encoder or an API client there in
    production (neither ships in this container). The default is the
    deterministic :func:`fake_text_embedding` — pure JVM, no Python
    stage at all, and the column contract (``string →
    array<float>``) is identical, so tests and plumbing exercise the
    real shape."""
    if model is None:
        return df.withColumn(
            output_col, fake_text_embedding(F.col(text_col), dim)
        )
    import pandas as pd
    from pyspark.sql.types import ArrayType, FloatType

    @F.pandas_udf(ArrayType(FloatType()))
    def _vec(s):
        vecs = model(s.fillna("").tolist())
        return pd.Series([[float(x) for x in v] for v in vecs])

    return df.withColumn(output_col, _vec(F.col(text_col)))
