"""Distributed PCA over an embedding column — dimensionality
reduction for 100-TB-scale vector corpora (whitening before ANN
indexing, semantic-dedup preprocessing, cheap visualization
projections).

The classic two-stage shape (what MLlib's RowMatrix PCA does under
the hood, re-expressed on the DataFrame API):

1. **One distributed pass** computes per-batch moment partials
   ``(n, Σx, Σxxᵀ)`` via ``mapInPandas`` — numpy BLAS per Arrow
   batch, so the heavy flops are vectorized C, and each partial is
   only ``d + d²`` doubles regardless of row count.
2. **Driver combine**: partials sum exactly (they're plain
   element-wise additions), then ``cov = (Σxxᵀ − n·μμᵀ)/(n−1)`` and a
   dense ``eigh`` on the tiny ``d×d`` matrix. For embedding dims
   (d ≤ a few thousand) this is microseconds; the driver never sees
   row data, only ``P·(d²+d)`` scalars for P batches.
3. **Projection** broadcasts the ``k×d`` component matrix inside a
   pandas UDF closure: one matmul per Arrow batch.

Sign convention: each component is flipped so its largest-magnitude
coefficient is positive — eigenvectors are otherwise sign-ambiguous
and results wouldn't be reproducible across BLAS builds.

No SQL oracle can replay an eigendecomposition; correctness is pinned
by pytest parity against numpy on collected data
(``tests/test_corpus_ops.py``) and the driver's ``embed_pca_stats`` query
oracle-verifies stage 1's moment accumulation (mean/variance per
dimension) exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PcaModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,)
    n: int


def _moment_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-Arrow-batch ``(n, Σx, Σxxᵀ flattened)`` partials."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "ss": [(x.T @ x).reshape(-1)],
                }
            )

    return df.select(F.col(vec_col).alias(vec_col)).mapInPandas(
        gen, schema="n long, s array<double>, ss array<double>"
    )


def moments(df: DataFrame, vec_col: str, dim: int):
    """Combined ``(n, mean, cov)`` from one distributed pass."""
    rows = _moment_partials(df, vec_col, dim).collect()
    if not rows:
        raise ValueError("moments() on an empty frame")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.asarray(r["ss"]) for r in rows], axis=0).reshape(dim, dim)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / max(n - 1, 1)
    return n, mean, cov


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int) -> PcaModel:
    n, mean, cov = moments(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return PcaModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=vals[order],
        n=n,
    )


def pca_fit_power(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    iters: int = 40,
) -> PcaModel:
    """PCA fit via a FIXED-SCHEDULE power iteration with deflation —
    numerically identical on any platform that runs the same
    schedule, which makes the projection ORACLE-REPLAYABLE in plain
    SQL (the driver's ``embed_pca_project`` query unrolls the exact
    same iterations as chained CTEs over the covariance table;
    ``np.linalg.eigh`` has no SQL twin). Same distributed moments
    pass as :func:`pca_fit`; the iteration itself is O(iters·d²) on
    the driver. Per component: ``iters`` steps of
    ``v ← C·v / ‖C·v‖`` from the exact start ``1/√d``, then the sign
    flip (largest-|coefficient| positive, first index on ties), then
    deflation ``C ← C − λ·vvᵀ`` with ``λ = vᵀCv``. With a spectral
    gap this converges to the true eigenbasis; without one it is
    still a deterministic orthogonal-ish projection both sides
    compute identically."""
    n, mean, cov = moments(df, vec_col, dim)
    c = cov.copy()
    comps = np.zeros((k, dim))
    lams = np.zeros(k)
    for ki in range(k):
        v = np.full(dim, 1.0 / np.sqrt(dim))
        for _ in range(iters):
            w = c @ v
            v = w / np.sqrt(np.dot(w, w))
        if v[np.abs(v).argmax()] < 0:
            v = -v
        lam = float(v @ c @ v)
        comps[ki] = v
        lams[ki] = lam
        c = c - lam * np.outer(v, v)
    return PcaModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        explained_variance=lams,
        n=n,
    )


def pca_project(
    df: DataFrame, model: PcaModel, vec_col: str, out_col: str = "pca"
) -> DataFrame:
    """Append ``out_col = components · (x − mean)`` as
    ``array<double>``. The k×d matrix ships once per executor inside
    the UDF closure (broadcast-by-closure; for d in the thousands
    switch to an explicit ``spark.sparkContext.broadcast``)."""
    comp = model.components
    mu = model.mean

    def project(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(s.to_numpy()).astype(np.float64)
        out = (x - mu) @ comp.T
        return pd.Series(list(out))

    fn = F.pandas_udf(project, "array<double>")
    return df.withColumn(out_col, fn(F.col(vec_col)))


def correlation_matrix(
    df: DataFrame, cols: list[str], include_diagonal: bool = False
) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns in ONE
    distributed pass: every ``F.corr(a, b)`` lands in a single
    aggregate node (map-side-combinable moment partials, one Exchange
    to one row), then the 1×(d·(d-1)/2) result unpivots via
    ``stack`` — no per-pair jobs, no driver row transfer beyond the
    final coefficient list.

    The feature-store diagnostic that belongs next to
    :func:`profile_table`: redundant-feature detection before
    training exports. For wide d (≥ ~100) the d² aggregate
    expressions bloat codegen — prefer PCA's moment pass
    (``fit_pca``) and derive correlations from the covariance it
    already accumulates.

    Output: ``col_a, col_b, corr`` (upper triangle, ``col_a <
    col_b`` positionally; diagonal opt-in)."""
    pairs = [
        (a, b)
        for i, a in enumerate(cols)
        for b in cols[i if include_diagonal else i + 1:]
    ]
    if not pairs:
        raise ValueError("need at least two columns (or the diagonal)")
    row = df.agg(
        *[
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(
                f"__c_{i}"
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', __c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return row.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (col_a, col_b, corr)"
    )
