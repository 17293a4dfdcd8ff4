"""Streaming data-quality monitoring: per-micro-batch distribution
drift against a static reference.

Composes the batch drift statistics (`operators/quality.py:
population_stability`) into the streaming surface: every micro-batch
is scored against a reference snapshot and an alert callback fires
when drift clears the threshold — the "is tonight's ingest shaped
like the corpus we trained on?" gate, running inside the ingest
stream instead of as a day-after batch job.

Scale design: the reference is reduced ONCE, before the stream
starts, to its (bin, count) histogram plus one non-null total — a
#bins-row frame that is persisted and eagerly materialized; the
reference DATA is never rescanned. Each micro-batch then adds one
map-side-combinable histogram aggregation over the batch and a
#bins-row join — per-batch cost is O(batch) scan plus O(bins) merge,
independent of reference size. PSI per batch is exactly the batch
operator's value (pinned by the parity test), so alerts are
reproducible in offline replay.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def psi_monitor(
    stream: DataFrame,
    reference: DataFrame,
    value_col: str,
    bin_width: float,
    threshold: float = 0.2,
    on_batch: Callable[[int, int, float | None, bool], None] | None = None,
):
    """foreachBatch writer scoring each micro-batch's ``value_col``
    distribution against ``reference`` via PSI.

    ``on_batch(batch_id, n_rows, psi, alert)`` fires per micro-batch;
    ``psi`` is None for batches with no non-null values (no alert).
    Conventional PSI reading: < 0.1 stable, 0.1–0.2 moderate shift,
    > 0.2 action (the default threshold).

    Returns the un-started ``DataStreamWriter`` — callers attach
    checkpoint/trigger options and ``.start()`` (same contract as the
    other streaming helpers).
    """
    from aligned_spark.operators.quality import (
        histogram,
        psi_from_reference_histogram,
    )

    # reference reduced to (#bins rows, one count) ONCE, before the
    # stream starts — per-batch work never touches the reference data
    ref_hist = (
        histogram(reference, value_col, bin_width)
        .select(F.col("bin_lo"), F.col("bin_count").alias("__qn"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ref_hist.count()  # materialize eagerly
    ref_total = reference.filter(F.col(value_col).isNotNull()).count()
    if not ref_total:
        # fail at setup, not inside foreachBatch at the first
        # non-empty micro-batch (which would crash a running stream
        # at an arbitrary later time)
        ref_hist.unpersist()
        raise ValueError(
            "psi_monitor needs a non-empty reference: no non-null "
            f"values in reference[{value_col!r}]"
        )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        nonnull = batch_df.filter(
            F.col(value_col).isNotNull()
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = nonnull.count()
            if n:
                psi = float(
                    psi_from_reference_histogram(
                        ref_hist, ref_total, nonnull, value_col,
                        bin_width,
                    ).first().psi
                )
                alert = psi > threshold
            else:
                psi, alert = None, False
            if on_batch is not None:
                on_batch(batch_id, n, psi, alert)
        finally:
            nonnull.unpersist()

    return stream.writeStream.outputMode("append").foreachBatch(_batch)
