"""Scaling-exponent sweep for the structural heavyweights.

The per-round bench proves sf0.1; this measures how the five
structurally heaviest operators scale when the input grows 10x
(sf-equivalent 1.0), publishing time-vs-rows exponents
``alpha = log(T_10x / T_1x) / log(10)`` — alpha ~= 1 is linear,
anything materially super-linear beyond a documented
output-cardinality term is a design defect.

The 10x corpus is constructed so PER-ROW WORK DENSITY stays constant
(the honest scaling experiment — naive replication would multiply
pairwise outputs 100x and measure output cardinality, not the
operator):

- ``documents`` x10: replica k offsets doc_id by k*10M and re-orders
  each doc's words by ``xxhash64(word, k, xxhash64(text))`` (replica
  0 keeps the original text). The CONTENT FINGERPRINT in the sort
  seed is load-bearing: identical texts share a fingerprint, so
  exact duplicates stay exact duplicates (within-replica dup density
  preserved), while any two DISTINCT texts get independent word
  permutations, so trigram-shingle overlap vanishes both across
  replicas and between distinct docs. (A first version seeded only
  with k — one GLOBAL word order per replica — which made every doc
  pair in a replica share long sorted runs and inflated
  prefix-Jaccard pairs 1700x: 256 -> 445k. Output cardinality, not
  operator cost.)
- ``events`` x10: replica k offsets event_id (k*1e9), user_id
  (k*1e7) and ``value`` (k*1e5). The value offset puts each
  replica's intervals in disjoint bin ranges, so interval-overlap
  output grows 10x (density constant), not 100x.
- ``lineitem`` x10: replica k offsets l_orderkey by k*1e9 (keeps the
  orders join 1:1 per replica; the counting-percentile census keys on
  VALUE columns, which replication leaves untouched — counts scale,
  distinct-value cardinality does not).
- ``orders`` x10: replica k offsets o_orderkey (k*1e9) and o_custkey
  (k*1e7) — the pagerank edge graph becomes 10 disjoint copies of the
  1x graph, so per-iteration density is constant.
- ``embeddings`` x10: replica k offsets vec_id (k*1e7) and circularly
  ROTATES each vector by k dims (replica 0 original). Rotation
  preserves norms and the uniform spread, and two rotated copies of
  uniform vectors are uncorrelated, so near-neighbor density per
  vector stays constant instead of creating 10 exact twins per point.

Usage: python tools/scale_sweep.py [--rebuild]
Prints one JSON line per query plus a summary table for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BIG = "/tmp/scale10"
REPLICAS = 10

QUERIES = [
    # round-5 set
    "dedup_minhash_arrow",
    "dedup_substring_spans_arrow",
    "join_interval_overlap",
    "sim_prefix_jaccard_pairs_arrow",
    "agg_percentiles_counting",
    # round-6 extension (VERDICT r5 task 4): graph / ANN / bloom
    "graph_pagerank",
    "graph_triangles",
    "eval_ann_recall",
    "dedup_semantic",
    "text_decontaminate_bloom",
    # round-6: steady-state re-measure of the r5 bench wobbles
    "corpus_domain_filter",
    "events_global_row_ids",
    # round-7: table-format CDC reconstruction (both postures) and
    # CDC-driven incremental aggregate maintenance — all build their
    # tables from `orders`, which the 10x corpus replicates with
    # disjoint key ranges (per-row change density constant, so the
    # honest expectation is alpha ~= 1: output-cardinality-bound)
    "source_delta_cdf",
    "source_iceberg_cdf",
    "source_delta_mor",
    "source_iceberg_mor",
    "store_incremental_aggregate",
    # round-8: keyed replaceWhere CDC and hybrid MIN/MAX IVM — same
    # orders-derived tables as the r7 entries (disjoint key ranges at
    # 10x, per-row change density constant)
    "source_delta_cdf_replace",
    "store_incremental_aggregate_minmax",
]


def build_big(spark) -> None:
    from pyspark.sql import functions as F

    from aligned_spark.sources.file import read_parquet

    os.makedirs(BIG, exist_ok=True)
    reps = list(range(REPLICAS))

    docs = read_parquet(spark, f"{BASE}/documents.parquet")
    rep = F.explode(F.array(*[F.lit(k) for k in reps])).alias("__k")
    exploded = docs.select("*", rep)
    words = F.split(F.col("text"), r"\s+")
    fp = F.xxhash64(F.col("text"))
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    words,
                    lambda w: F.struct(
                        F.xxhash64(
                            F.concat_ws(
                                "\x1f", w, F.col("__k"), fp
                            )
                        ).alias("h"),
                        w.alias("w"),
                    ),
                )
            ),
            lambda s: s.getField("w"),
        ),
        " ",
    )
    big_docs = exploded.select(
        (F.col("doc_id") + F.col("__k") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        F.when(F.col("__k") == 0, F.col("text"))
        .otherwise(shuffled)
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    big_docs.repartition(32).write.mode("overwrite").parquet(
        f"{BIG}/documents.parquet"
    )

    ev = read_parquet(spark, f"{BASE}/events.parquet")
    big_ev = ev.select("*", rep).select(
        (F.col("event_id") + F.col("__k") * F.lit(1_000_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("__k") * F.lit(10_000_000)).alias(
            "user_id"
        ),
        "event_type",
        (F.col("value") + F.col("__k") * F.lit(100_000.0)).alias("value"),
        "props",
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(
        f"{BIG}/events.parquet"
    )

    li = read_parquet(spark, f"{BASE}/lineitem.parquet")
    li.select("*", rep).withColumn(
        "l_orderkey",
        F.col("l_orderkey") + F.col("__k") * F.lit(1_000_000_000),
    ).drop("__k").repartition(32).write.mode("overwrite").parquet(
        f"{BIG}/lineitem.parquet"
    )

    od = read_parquet(spark, f"{BASE}/orders.parquet")
    od.select("*", rep).withColumn(
        "o_orderkey",
        F.col("o_orderkey") + F.col("__k") * F.lit(1_000_000_000),
    ).withColumn(
        "o_custkey",
        F.col("o_custkey") + F.col("__k") * F.lit(10_000_000),
    ).drop("__k").repartition(32).write.mode("overwrite").parquet(
        f"{BIG}/orders.parquet"
    )

    emb = read_parquet(spark, f"{BASE}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    rolled = F.concat(
        F.slice(F.col("embedding"), F.col("__k") + 1, F.lit(dim)),
        F.slice(F.col("embedding"), 1, F.col("__k")),
    )
    emb.select("*", rep).select(
        (F.col("vec_id") + F.col("__k") * F.lit(10_000_000)).alias(
            "vec_id"
        ),
        F.when(F.col("__k") == 0, F.col("embedding"))
        .otherwise(rolled)
        .alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        f"{BIG}/embeddings.parquet"
    )


def _force(df) -> None:
    df.selectExpr("sum(xxhash64(struct(*)))").collect()


def timed(fn, spark, sf_dir: str) -> float:
    _force(fn(spark, sf_dir))  # untimed warm-up
    spark.catalog.clearCache()
    samples = []
    for _ in range(3):
        t0 = time.time()
        _force(fn(spark, sf_dir))
        samples.append(time.time() - t0)
        spark.catalog.clearCache()
    return min(samples)


def main() -> None:
    import gc
    import math

    import __spark_entry__ as entry
    from aligned_spark.session import get_spark

    spark = get_spark("scale_sweep")
    if "--rebuild" in sys.argv or not os.path.exists(
        f"{BIG}/embeddings.parquet"  # r6 extension marker
    ):
        print("building 10x corpus at", BIG, file=sys.stderr)
        build_big(spark)
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    rows = []
    for name in (n for n in QUERIES if not only or n in only):
        t1 = timed(qs[name], spark, BASE)
        gc.collect()
        t10 = timed(qs[name], spark, BIG)
        gc.collect()
        alpha = math.log(t10 / t1) / math.log(REPLICAS)
        rows.append(
            {
                "query": name,
                "t_1x_sec": round(t1, 3),
                "t_10x_sec": round(t10, 3),
                "exponent": round(alpha, 3),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"sweep": rows, "replicas": REPLICAS}))
    spark.stop()


if __name__ == "__main__":
    main()
