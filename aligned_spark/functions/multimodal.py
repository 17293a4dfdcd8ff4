"""Multimodal (image/audio/video) column plumbing.

Reference capability: ``LoadImageUrl``/``LoadImageUrlBytes``/
``GrayscaleImage`` (``aligned/schemas/transformation.py:2201-2283``)
treat media as bytes + per-row tensor transforms. Spark-first
re-expression: media travel as opaque ``binary`` columns with typed
metadata; decode / feature-extract run as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-by-row.

The actual codec step is STUBBED (``decoder=None`` → deterministic
fake features; a real decoder raises ``NotImplementedError`` unless
supplied) because image/audio libs are not in this container — but
the Spark-side plumbing (schema, batching, partition shape) is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)


def binary_metadata(blob: Column) -> Column:
    """Typed metadata struct for an opaque binary column:
    byte length + md5 hex digest. Pure codegen."""
    return F.struct(
        F.length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest"),
    )


def _fake_features(data: bytes, size: int) -> list[float]:
    """Deterministic fake feature vector from the byte content —
    stands in for a real decode+embed step, preserving the contract
    (same bytes → same vector)."""
    out: list[float] = []
    counter = 0
    while len(out) < size:
        h = hashlib.sha256(data + counter.to_bytes(4, "little")).digest()
        for i in range(0, len(h) - 7, 8):
            v = int.from_bytes(h[i : i + 8], "little")
            out.append((v % 2_000_001) / 1_000_000.0 - 1.0)
            if len(out) >= size:
                break
        counter += 1
    return out


def extract_media_features(
    df: DataFrame,
    blob_col: str,
    out_col: str = "features",
    size: int = 16,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Decode/feature-extract a binary media column via Arrow-batched
    ``mapInPandas``.

    ``decoder`` maps raw bytes → feature list (e.g. decode image →
    resize → pool). ``None`` uses the deterministic fake (container
    has no codecs). The UDF sees whole Arrow batches — bytes stay
    off the Python heap until their batch is processed, and the
    output schema is declared so Catalyst plans downstream ops
    normally."""
    fields = [f for f in df.schema.fields]
    out_schema = StructType(
        fields + [StructField(out_col, ArrayType(DoubleType()), True)]
    )
    decode = decoder if decoder is not None else (
        lambda b: _fake_features(b, size)
    )

    def _extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [
                None if b is None else decode(bytes(b))
                for b in pdf[blob_col]
            ]
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(feats, index=pdf.index, dtype=object)
            yield pdf

    return df.mapInPandas(_extract, schema=out_schema)


def frame_sample_indices(
    n_frames: Column, every_n: int = 30, max_frames: int = 16
) -> Column:
    """Frame-sampling plan for a video column: indices
    ``[0, every_n, 2·every_n, …]`` capped at ``max_frames`` — computed
    codegen-side so the expensive decode UDF touches only sampled
    frames."""
    upper = F.least(
        (n_frames - 1) / every_n, F.lit(max_frames - 1)
    ).cast("long")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(upper, F.lit(0))),
        lambda i: i * every_n,
    )


def decode_image(blob: Column):
    """Real image decode — not available in this container.

    Supply a ``decoder`` to :func:`extract_media_features` instead;
    this symbol exists so callers get an explicit, early error."""
    raise NotImplementedError(
        "image codecs are not installed; pass decoder= to "
        "extract_media_features (the Spark plumbing is fully wired)"
    )
