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


def sample_frames(
    df: DataFrame,
    blob_col: str,
    id_cols: list[str],
    frame_size: int = 1024,
    every_n: int = 2,
    max_frames: int = 8,
    extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Frame sampling over a binary media column: one output row per
    sampled frame — ``id_cols + (frame_idx, frame)``.

    ``extractor(data, idx) -> bytes`` is the codec hook (a real
    video decoder seeks to frame ``idx``); ``None`` uses the
    deterministic fake codec — frame ``idx`` is the byte range
    ``[idx·frame_size, (idx+1)·frame_size)`` — preserving the
    contract (same bytes → same frames) without media libs. Frames
    ``0, every_n, 2·every_n, …`` are taken, at most ``max_frames``
    (the :func:`frame_sample_indices` plan).

    Arrow-batched ``mapInPandas``: bytes stay in Arrow buffers until
    their batch is processed, the fan-out happens inside the worker
    (no explode shuffle), and the declared schema lets Catalyst plan
    downstream ops normally. At 100 TB the decode cost dominates —
    sampling indices are computed before any decode so only sampled
    frames are touched."""
    import math

    from pyspark.sql.types import BinaryType, LongType

    fields = [f for f in df.schema.fields if f.name in id_cols]
    out_schema = StructType(
        fields
        + [
            StructField("frame_idx", LongType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def _default_extract(data: bytes, idx: int) -> bytes:
        return data[idx * frame_size : (idx + 1) * frame_size]

    extract = extractor or _default_extract

    def _frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in id_cols}
            out["frame_idx"] = []
            out["frame"] = []
            # column-list iteration, not iterrows (which constructs a
            # Series per row — the pandas row-at-a-time trap)
            id_lists = {c: pdf[c].tolist() for c in id_cols}
            for ridx, data in enumerate(pdf[blob_col].tolist()):
                if data is None:
                    continue
                data = bytes(data)
                n_frames = math.ceil(len(data) / frame_size)
                idxs = list(range(0, n_frames, every_n))[:max_frames]
                for i in idxs:
                    for c in id_cols:
                        out[c].append(id_lists[c][ridx])
                    out["frame_idx"].append(i)
                    out["frame"].append(extract(data, i))
            yield pd.DataFrame(out, columns=list(out))

    return df.mapInPandas(_frames, schema=out_schema)
