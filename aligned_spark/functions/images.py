"""Image column operations.

Reference capability: ``LoadImageUrlBytes`` / ``LoadImageUrl`` /
``GrayscaleImage`` (``aligned/schemas/transformation.py:2201-2283``)
and ``PresignedAwsUrl`` (``transformation.py:2671-2708``).

The reference implementation collects every URL to the driver and
fetches with one asyncio gather — a non-starter at corpus scale. Here
each step is an Arrow-batched column operation that runs where the
rows are:

- fetch: per-batch loop in a pandas UDF (IO-bound; executors
  parallelize across batches). Local paths / ``file://`` work out of
  the box; http(s) needs an injected ``fetcher`` (this container is
  offline).
- decode: PIL when importable, else a clearly-marked deterministic
  fake tensor (the container has no image codecs — the Spark-side
  schema/batching is real, the codec is the stub).
- grayscale: numpy channel-mean per row inside the batch — the
  nested-array HOF alternative would evaluate interpreted per
  element (see PERF.md) and is hopeless at H×W×C scale.
- presigned URLs: boto3 when importable, else an injected ``signer``;
  never fabricates unsigned URLs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    StringType,
)

_TENSOR3 = ArrayType(ArrayType(ArrayType(DoubleType())))
_TENSOR2 = ArrayType(ArrayType(DoubleType()))


def _default_fetch(url: str) -> bytes | None:
    if url is None:
        return None
    if url.startswith("file://"):
        url = url[len("file://") :]
    if url.startswith(("http://", "https://", "s3://", "s3a://")):
        raise NotImplementedError(
            "no network in this environment — pass fetcher= to "
            "load_image_bytes (the Spark plumbing is fully wired)"
        )
    with open(url, "rb") as f:
        return f.read()


def load_image_bytes(
    url: Column, fetcher: Callable[[str], bytes | None] | None = None
) -> Column:
    """URL/path column → binary column, fetched executor-side in
    Arrow batches (``LoadImageUrlBytes:2201``; the reference gathers
    on the driver — here rows never leave their partition)."""
    fetch = fetcher or _default_fetch

    def _kernel(s: pd.Series) -> pd.Series:
        return s.map(lambda u: None if u is None else fetch(u))

    return F.pandas_udf(_kernel, BinaryType())(url)


def _fake_decode(data: bytes) -> np.ndarray:
    """Deterministic stand-in tensor (8×8×3, values in [0, 1]) derived
    from the byte content — same bytes → same tensor. Used ONLY when
    PIL is absent; preserves the decode step's column contract."""
    h = hashlib.sha256(data).digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    tile = np.resize(seed, 8 * 8 * 3).reshape(8, 8, 3)
    return tile / 255.0


def decode_image(
    blob: Column, decoder: Callable[[bytes], np.ndarray] | None = None
) -> Column:
    """Binary column → H×W×C double tensor (``LoadImageUrl:2228``
    decodes to an ndarray). Decoder resolution order: explicit
    ``decoder`` → PIL (if importable) → deterministic fake."""
    if decoder is None:
        try:
            from io import BytesIO

            from PIL import Image as _PILImage  # type: ignore

            def decoder(data: bytes) -> np.ndarray:
                arr = np.asarray(_PILImage.open(BytesIO(data)))
                return arr.astype(np.float64)

        except ImportError:
            decoder = _fake_decode

    def _kernel(s: pd.Series) -> pd.Series:
        out = [
            None if b is None else decoder(bytes(b)).tolist() for b in s
        ]
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, _TENSOR3)(blob)


def grayscale_image(image: Column) -> Column:
    """H×W×C tensor → H×W channel mean; already-2-D input passes
    through (``GrayscaleImage:2259`` semantics)."""

    def _kernel(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            arr = np.asarray(t, dtype=np.float64)
            out.append(
                (arr.mean(axis=2) if arr.ndim == 3 else arr).tolist()
            )
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, _TENSOR2)(image)


def resize_image(
    image: Column, height: int, width: int
) -> Column:
    """H×W×C tensor → ``height×width``×C via nearest-neighbor index
    sampling — pure numpy (PIL-free), deterministic, and the exact
    batch shape a real Lanczos/bilinear kernel would slot into (swap
    the index-sampling line for ``PIL.Image.resize`` when PIL is
    present; the Spark-side contract is identical).

    CAVEAT (environment, not semantics): this container's pyarrow
    segfaults the Python worker on NULL or EMPTY rows of depth-3
    array columns — through ANY pandas UDF, including identity
    (verified by bisection; depth ≤2 is fine). Filter
    ``tensor IS NOT NULL AND size(tensor) > 0`` before tensor-input
    UDFs, or chain directly off ``decode_image`` in the same plan."""

    def _kernel(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if t is None:
                out.append(None)
                continue
            # Arrow hands nested arrays over as object ndarrays of
            # ndarrays — stack them into one dense tensor first
            arr = np.asarray(
                [np.stack([np.asarray(c) for c in row]) for row in t],
                dtype=np.float64,
            )
            if arr.ndim == 2:
                arr = arr[:, :, None]
            h, w = arr.shape[:2]
            ri = (np.arange(height) * h) // height
            ci = (np.arange(width) * w) // width
            out.append(arr[np.ix_(ri, ci)].tolist())
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, _TENSOR3)(image)


def presigned_aws_url(
    key: Column,
    bucket: str,
    max_age_seconds: int = 30,
    signer: Callable[[str], str] | None = None,
) -> Column:
    """S3 key column → presigned GET URL (``PresignedAwsUrl:2671``).

    Signs executor-side per Arrow batch. Uses ``signer`` when given,
    else boto3 (reads ambient AWS credentials); raises if neither is
    available rather than fabricating an unsigned URL."""
    if signer is not None:

        def _kernel(s: pd.Series) -> pd.Series:
            return s.map(lambda k: None if k is None else signer(k))

    else:
        try:
            import boto3  # noqa: F401  (availability probe, driver-side)
        except ImportError as exc:
            raise NotImplementedError(
                "boto3 is not installed — pass signer= to "
                "presigned_aws_url"
            ) from exc

        def _kernel(s: pd.Series) -> pd.Series:
            # client created executor-side: boto3 clients don't pickle
            import boto3

            client = boto3.client("s3")
            return s.map(
                lambda k: None
                if k is None
                else client.generate_presigned_url(
                    "get_object",
                    Params={"Bucket": bucket, "Key": k},
                    ExpiresIn=max_age_seconds,
                )
            )

    return F.pandas_udf(_kernel, StringType())(key)


def image_dhash(gray: Column) -> Column:
    """Perceptual dHash of an 8×8 grayscale tensor: 56 bits, one per
    horizontally-adjacent pixel pair (``gray[r][c] > gray[r][c+1]``)
    — the standard difference-hash for near-duplicate image detection
    (identical content → identical hash regardless of encoding
    container; 1-bit-tolerant matching composes with the SimHash
    pigeonhole machinery).

    Pure codegen comparison ladder — no UDF. IMPORTANT: pass a
    *materialized column* (project the grayscale tensor first); the
    expression reads the tensor 112 times and Spark will not CSE a
    pandas-UDF subtree."""

    def g(r: int, c: int) -> Column:
        return F.element_at(F.element_at(gray, r + 1), c + 1)

    bits = None
    for r in range(8):
        for c in range(7):
            term = F.when(
                g(r, c) > g(r, c + 1), F.lit(1 << (r * 7 + c))
            ).otherwise(F.lit(0))
            bits = term if bits is None else bits + term
    return bits.cast("long")
