"""Streaming data-quality monitoring: per-micro-batch distribution
drift against a static reference.

Composes the batch drift statistics (`operators/quality.py:
population_stability`) into the streaming surface: every micro-batch
is scored against a reference snapshot and an alert callback fires
when drift clears the threshold — the "is tonight's ingest shaped
like the corpus we trained on?" gate, running inside the ingest
stream instead of as a day-after batch job.

Scale design: the reference histogram is aggregated ONCE and
persisted (a bin-keyed frame of #bins rows, not the reference data);
each micro-batch adds one map-side-combinable histogram aggregation
over the batch and a #bins-row join — per-batch cost is O(batch) scan
plus O(bins) merge, independent of reference size. PSI per batch is
exactly the batch operator's value (pinned by the parity test), so
alerts are reproducible in offline replay.
"""

from __future__ import annotations

from collections.abc import Callable

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
    from aligned_spark.operators.quality import population_stability

    ref = reference.select(F.col(value_col)).persist()
    ref.count()  # materialize once, before the stream starts

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        nonnull = batch_df.filter(F.col(value_col).isNotNull())
        if nonnull.take(1):
            psi = float(
                population_stability(
                    ref, nonnull, value_col, bin_width
                ).first().psi
            )
            alert = psi > threshold
        else:
            psi, alert = None, False
        if on_batch is not None:
            on_batch(batch_id, n, psi, alert)

    return stream.writeStream.outputMode("append").foreachBatch(_batch)
