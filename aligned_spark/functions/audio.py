"""Audio-modality plumbing: opaque binary blobs → PCM decode →
windowed frame features, executor-side in Arrow batches.

Mirrors the image pipeline's design (``functions/images.py``): the
blob column is opaque ``binary`` + typed metadata; the decode step
resolves a real decoder when one is importable (soundfile/librosa are
absent in this container) and otherwise uses a DETERMINISTIC fake PCM
codec — byte ``b`` becomes the centered sample ``b − 128`` — so the
Spark-side plumbing (schema, batching, windowing arithmetic) is real
and fully testable, and the window features are even exactly
SQL-replayable for ASCII payloads (``ord(byte) − 128``).

Frame features use EXACT integer accumulation (sum of squared int
samples, integer zero-crossing counts); the only float ops are one
division by the exact constant ``128² · win`` and one IEEE sqrt —
both correctly rounded and engine-independent, so no rounding
tolerance is needed anywhere.

Reference capability: none (the aligned reference has no audio
operators); this extends the multimodal surface of the training-data
pillar alongside images and frame sampling.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _fake_pcm(data: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: each byte is one centered
    int16-ish sample in [-128, 127]. Same bytes → same signal."""
    return np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128


def _resolve_decoder(
    decoder: Callable[[bytes], np.ndarray] | None,
) -> Callable[[bytes], np.ndarray]:
    """Decoder resolution shared by :func:`decode_pcm` and
    :func:`audio_window_features`: explicit ``decoder`` → soundfile
    (if importable; multi-channel input is mean-downmixed to mono so
    the output always fits the 1-D sample contract) → deterministic
    fake."""
    if decoder is not None:
        return decoder
    try:
        from io import BytesIO

        import soundfile as _sf  # type: ignore

        def _real(data: bytes) -> np.ndarray:
            sig, _rate = _sf.read(BytesIO(data), dtype="int16")
            if sig.ndim > 1:  # (frames, channels) → mono downmix
                sig = sig.mean(axis=1)
            return np.asarray(sig).astype(np.int64)

        return _real
    except ImportError:
        return _fake_pcm


def decode_pcm(
    blob: Column, decoder: Callable[[bytes], np.ndarray] | None = None
) -> Column:
    """Binary column → array<bigint> of centered PCM samples.
    Decoder resolution: see :func:`_resolve_decoder`."""
    decoder = _resolve_decoder(decoder)

    def _kernel(s: pd.Series) -> pd.Series:
        out = [
            None if b is None else decoder(bytes(b)).tolist() for b in s
        ]
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, ArrayType(LongType()))(blob)


_WINDOW_SCHEMA = StructType(
    [
        StructField("__id", LongType()),
        StructField("window_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_window_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    win: int = 50,
    hop: int = 25,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Sliding-window frame features over a binary audio column: one
    row per (doc, window) with RMS energy and the zero-crossing count
    — the VAD/energy-gate front end of an audio training-data
    pipeline (silence trimming, clipping detection, segment QC).

    Windows are full-length only (``floor((n−win)/hop)+1`` per doc;
    docs shorter than ``win`` samples emit nothing). RMS is
    ``sqrt(Σ s² / (128² · win))`` with the sum accumulated as exact
    integers; zero crossings count strict sign flips of adjacent
    samples (zeros break a run, matching the exact SQL replay).

    Scale shape: ``mapInPandas`` — decode + window extraction stay
    inside one Arrow batch pass, emitting only the (small) feature
    rows; no shuffle, no driver transfer, parallel in the input's
    partitioning. One vectorized numpy stride trick per batch, not a
    per-window Python loop.
    """
    if win <= 0 or hop <= 0:
        raise ValueError("win and hop must be positive")
    dec = _resolve_decoder(decoder)
    denom = float(128 * 128 * win)

    src = df.select(F.col(id_col).alias("__id"), F.col(blob_col).alias("__b"))

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = dec
        for pdf in batches:
            ids, wids, ns, rms, zcs = [], [], [], [], []
            for i, b in zip(pdf["__id"], pdf["__b"]):
                if b is None:
                    continue
                s = d(bytes(b))
                n = len(s)
                if n < win:
                    continue
                n_win = (n - win) // hop + 1
                idx = np.arange(win)[None, :] + hop * np.arange(n_win)[:, None]
                frames = s[idx]  # (n_win, win) — one gather, no loop
                e = np.sum(frames * frames, axis=1)
                signs = np.sign(frames)
                zc = np.sum(
                    (signs[:, :-1] * signs[:, 1:]) < 0, axis=1
                )
                ids.extend([i] * n_win)
                wids.extend(range(n_win))
                ns.extend([win] * n_win)
                rms.extend(np.sqrt(e / denom))
                zcs.extend(zc.tolist())
            yield pd.DataFrame(
                {
                    "__id": pd.Series(ids, dtype="int64"),
                    "window_id": pd.Series(wids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zero_crossings": pd.Series(zcs, dtype="int64"),
                }
            )

    out = src.mapInPandas(_features, _WINDOW_SCHEMA)
    return out.withColumnRenamed("__id", id_col)
