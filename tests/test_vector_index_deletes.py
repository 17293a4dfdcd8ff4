"""CDC-driven vector-index maintenance, DELETE side (round-9, VERDICT
task 5; reference: ``UpdateVectorIndexJob``,
aligned/retrieval_job.py:2131-2164 keeps the index in sync on writes).

Covers: deleted keys leave the IVF/IVF-PQ stores (touched cluster
partitions rewritten, untouched partition files byte-identical),
apply_changes folds a readChangeFeed-shaped slice (incl. updates =
delete+reinsert, vector moves cluster), recall against brute force
after deletes, and the staleness counter triggering re-clustering.
"""

from __future__ import annotations

import glob
import os
import random

from pyspark.sql import functions as F

from aligned_spark.sources.vector_index import (
    IvfIndexSource,
    IvfPqIndexSource,
)


def _corpus(spark, n=300, dim=8, seed=7):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [
            (i, [rng.gauss(0, 1) for _ in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<float>",
    )


def _brute_topk(spark, corpus, queries, k=5):
    from aligned_spark.operators.similarity import top_k_similar

    out = top_k_similar(
        queries, corpus, "vec_id", "embedding", k=k
    )
    return {
        (r["query_id"], r["neighbor_id"])
        for r in out.collect()
    }


def test_ivf_delete_rewrites_only_touched_clusters(spark, tmp_path):
    emb = _corpus(spark)
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"),
        id_col="vec_id",
        vector_col="embedding",
        num_centroids=6,
        seed=3,
    )
    ivf.overwrite(emb)
    data = ivf.read(spark)
    # pick every id of ONE cluster plus one id of another
    rows = data.select("vec_id", "__ivf_cluster").collect()
    by_c: dict = {}
    for r in rows:
        by_c.setdefault(r["__ivf_cluster"], []).append(r["vec_id"])
    clusters = sorted(by_c, key=lambda c: len(by_c[c]))
    kill_all_of, kill_one_of = clusters[0], clusters[-1]
    doomed = set(by_c[kill_all_of]) | {by_c[kill_one_of][0]}
    untouched = [
        c for c in clusters if c not in (kill_all_of, kill_one_of)
    ]
    before = {
        c: sorted(
            glob.glob(
                os.path.join(
                    ivf._data_path(), f"__ivf_cluster={c}", "*.parquet"
                )
            )
        )
        for c in untouched
    }
    mtimes = {
        c: [os.path.getmtime(p) for p in ps]
        for c, ps in before.items()
    }

    n = ivf.delete(
        spark.createDataFrame(
            [(i,) for i in doomed], "vec_id long"
        )
    )
    assert n == len(doomed)
    got = ivf.read(spark)
    assert got.filter(
        F.col("vec_id").isin([int(i) for i in doomed])
    ).count() == 0
    assert got.count() == 300 - len(doomed)
    # fully-emptied cluster directory is gone
    assert not os.path.exists(
        os.path.join(
            ivf._data_path(), f"__ivf_cluster={kill_all_of}"
        )
    )
    # untouched cluster partitions were not rewritten
    for c in untouched:
        after = sorted(
            glob.glob(
                os.path.join(
                    ivf._data_path(), f"__ivf_cluster={c}", "*.parquet"
                )
            )
        )
        assert after == before[c]
        assert [os.path.getmtime(p) for p in after] == mtimes[c]


def test_ivf_apply_changes_and_recall_after_deletes(spark, tmp_path):
    emb = _corpus(spark)
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"),
        id_col="vec_id",
        vector_col="embedding",
        num_centroids=5,
        seed=3,
    )
    ivf.overwrite(emb)
    # CDC slice: delete %7 keys, update key 8 to a NEW vector (it
    # may move cluster), insert two new keys
    new_vec = [9.0] * 8
    changes = (
        emb.filter(F.col("vec_id") % 7 == 0)
        .select("vec_id", "embedding")
        .withColumn("_change_type", F.lit("delete"))
        .unionByName(
            emb.filter(F.col("vec_id") == 8)
            .select("vec_id", "embedding")
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        .unionByName(
            spark.createDataFrame(
                [
                    (8, new_vec, "update_postimage"),
                    (1000, [1.0] * 8, "insert"),
                    (1001, [-1.0] * 8, "insert"),
                ],
                "vec_id long, embedding array<float>, _change_type string",
            )
        )
    )
    ivf.apply_changes(changes)

    survivors = (
        emb.filter(
            (F.col("vec_id") % 7 != 0) & (F.col("vec_id") != 8)
        )
        .unionByName(
            spark.createDataFrame(
                [(8, new_vec), (1000, [1.0] * 8), (1001, [-1.0] * 8)],
                "vec_id long, embedding array<float>",
            )
        )
    )
    got = ivf.read(spark)
    assert sorted(
        r["vec_id"] for r in got.select("vec_id").collect()
    ) == sorted(r["vec_id"] for r in survivors.collect())
    # key 8 carries the NEW vector exactly once
    v8 = got.filter("vec_id = 8").collect()
    assert len(v8) == 1 and list(v8[0]["embedding"]) == new_vec

    # full-probe query over the maintained index == brute force over
    # the surviving corpus (deleted keys never surface)
    queries = survivors.filter(F.col("vec_id") < 12)
    want = _brute_topk(spark, survivors, queries, k=5)
    out = ivf.nearest_n(queries, n=5, nprobe=5)
    have = {
        (r["query_id"], r["neighbor_id"]) for r in out.collect()
    }
    assert have == want


def test_ivf_staleness_triggers_retrain(spark, tmp_path):
    emb = _corpus(spark, n=200)
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"),
        id_col="vec_id",
        vector_col="embedding",
        num_centroids=4,
        seed=3,
    )
    ivf.overwrite(emb)
    assert not ivf.should_retrain(spark)
    assert not ivf.maybe_retrain(spark)

    # churn 30% of the corpus out
    ivf.delete(
        emb.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    )
    assert ivf.should_retrain(spark, max_deleted_ratio=0.2)
    assert ivf.maybe_retrain(spark, max_deleted_ratio=0.2)
    # retrain resets the counter and preserves the survivors
    assert not ivf.should_retrain(spark, max_deleted_ratio=0.2)
    got = ivf.read(spark)
    assert got.count() == emb.filter(F.col("vec_id") % 3 != 0).count()
    assert len(ivf.centroids(spark)) == 4


def test_ivfpq_delete_and_recall(spark, tmp_path):
    emb = _corpus(spark, n=400, dim=8)
    pq = IvfPqIndexSource(
        path=str(tmp_path / "pq"),
        id_col="vec_id",
        vector_col="embedding",
        num_centroids=4,
        m=4,
        k=16,
        seed=3,
    )
    pq.overwrite(emb)
    doomed = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    n = pq.delete(doomed)
    assert n == emb.filter(F.col("vec_id") % 5 == 0).count()
    # both stores cleaned
    spark_codes = spark.read.parquet(pq._p("codes"))
    spark_vecs = spark.read.parquet(pq._p("vectors"))
    assert spark_codes.filter("id % 5 = 0").count() == 0
    assert spark_vecs.filter("id % 5 = 0").count() == 0

    survivors = emb.filter(F.col("vec_id") % 5 != 0)
    queries = survivors.filter(F.col("vec_id") < 12)
    out = pq.nearest_n(
        queries, n=5, nprobe=4, refine=4
    )  # all clusters probed + exact refine
    # no deleted id ever surfaces, and refined recall vs brute force
    # stays high (PQ at full probe + refine is near-exact)
    ids = {r["id"] for r in out.collect()}
    assert all(i % 5 != 0 for i in ids)
    want = _brute_topk(spark, survivors, queries, k=5)
    have = {(r["query_id"], r["id"]) for r in out.collect()}
    recall = len(have & want) / len(want)
    assert recall >= 0.8

    # staleness machinery mirrors the IVF index
    assert not pq.should_retrain(spark, max_deleted_ratio=0.5)
    assert pq.should_retrain(spark, max_deleted_ratio=0.1)
    assert pq.maybe_retrain(spark, max_deleted_ratio=0.1)
    assert not pq.should_retrain(spark, max_deleted_ratio=0.1)
    assert (
        spark.read.parquet(pq._p("vectors")).count()
        == survivors.count()
    )


def test_index_maintain_continuously_from_cdf_stream(spark, tmp_path):
    """The full story: base Delta table -> readChangeFeed stream ->
    foreachBatch -> IvfIndexSource.apply_changes. The default-start
    stream's snapshot slice BOOTSTRAPS the index (trains the
    quantizer), appends fold in, deletes leave touched partitions,
    and a drained-stream replay adds nothing twice."""
    from aligned_spark.sources.delta import DeltaSource

    base = str(tmp_path / "base")
    src = DeltaSource(path=base)
    emb = _corpus(spark, n=200)
    src.insert(emb.coalesce(1))
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"),
        id_col="vec_id",
        vector_col="embedding",
        num_centroids=4,
        seed=3,
    )
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = ivf.maintain_continuously(spark, base, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()

    drain()  # micro-batch 1: snapshot -> bootstrap build
    assert len(ivf.centroids(spark)) == 4
    assert ivf.read(spark).count() == 200

    src.insert(
        spark.createDataFrame(
            [(500, [2.0] * 8)], "vec_id long, embedding array<float>"
        )
    )
    src.delete_where(spark, F.col("vec_id") % 4 == 0)
    drain()  # micro-batches 2-3: append + delete
    got = ivf.read(spark)
    want = (
        emb.filter(F.col("vec_id") % 4 != 0)
        .unionByName(
            spark.createDataFrame(
                [(500, [2.0] * 8)],
                "vec_id long, embedding array<float>",
            )
        )
    )
    assert sorted(
        r["vec_id"] for r in got.select("vec_id").collect()
    ) == sorted(r["vec_id"] for r in want.collect())

    # replay: a fresh checkpoint over the same commits is a no-op
    # (replayed inserts dedupe against present keys)
    q = ivf.maintain_continuously(
        spark, base, str(tmp_path / "ckpt2")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    got2 = ivf.read(spark)
    assert got2.count() == got2.select("vec_id").distinct().count()
