"""Graph analytics over edge DataFrames.

Connected components (the dedup workhorse) lives in
:mod:`aligned_spark.operators.dedup`; this module adds rank-style
iterative algorithms. Reference capability: none (the aligned
reference has no graph operators); this extends the training-data
surface — entity importance for sampling weights, source authority
for quality priors.

Scale design (100 TB of edges): every iteration is one shuffle — the
contribution join is hash-partitioned on the source key and the sum
on the destination key; the edge frame (joined once with out-degrees)
is persisted so iterations reread a materialized frame instead of
recomputing the input plan; each iteration's ranks are
local-checkpointed to truncate the otherwise exponentially-growing
lineage (the standard iterative-Spark pattern, same as the
connected-components loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list.

    Returns ``(node, pr)`` for every node appearing as a source or
    destination. Simple-variant semantics, stated precisely so the
    oracle can replay them: ranks start uniform at ``1/N``; each
    iteration sets ``pr' = (1-d)/N + d * Σ_in pr/outdeg``; dangling
    nodes (no out-edges) keep receiving but their mass is NOT
    redistributed (the common simplification — full dangling-mass
    handling adds a per-iteration global sum).

    A fixed iteration count (not convergence-tested) keeps the
    computation a pure deterministic dataflow — replayable as N
    chained SQL stages by an independent engine."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        # persisted: the node frame appears in EVERY iteration's
        # teleport join (and the count below) — unpersisted, the
        # distinct-union (a full shuffle of the edge list) re-runs
        # once per iteration. At bench scale (60k edges) persisting
        # measures ~15% SLOWER (materialization overhead beats three
        # cheap recomputes); at corpus scale the recompute is
        # iterations × an edge-list-wide shuffle and persist wins —
        # this operator optimizes for the latter.
        .persist()
    )
    n = nodes.count()  # one tiny driver scalar, like CC's edge count
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    e = (
        edges.select(src, dst)
        .join(out_deg, on=src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            F.col("__deg"),
        )
        .persist()
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for _ in range(iterations):
        contribs = e.join(
            ranks, e["__src"] == ranks["node"]
        ).select(
            F.col("__dst").alias("node"),
            (F.col("pr") / F.col("__deg")).alias("__c"),
        )
        sums = contribs.groupBy("node").agg(F.sum("__c").alias("__s"))
        ranks = (
            nodes.join(sums, on="node", how="left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("__s", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
