"""Vector index source: persisted embeddings with LSH buckets.

Reference: ``VectorIndex.nearest_n_to`` (``aligned/sources/
vector_index.py:5-11``), LanceDB impl (``aligned/sources/
lancedb.py:158-212`` — row-loops an ANN index per query row) and
``UpdateVectorIndexJob`` (``aligned/retrieval_job.py:2131-2164`` —
refreshes the index on insert).

Spark-first: the "index" is a parquet/Delta table of
``(id, embedding, bucket…)`` where the bucket columns are
random-hyperplane LSH codes computed AT WRITE time. ``nearest_n``
prunes candidates by bucket match (any of ``num_tables`` codes) and
ranks the survivors exactly — a scan + one shuffle for the top-k
window, never a cross join, and no driver loop. ``exact=True``
bypasses pruning for ground truth.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from aligned_spark.operators.similarity import (
    _lsh_buckets_arrow,
    _pair_cosine_arrow,
    cosine_double,
    lsh_bucket,
)
from aligned_spark.sources.file import ParquetSource


def _delete_from_clustered(
    spark: SparkSession,
    data_path: str,
    id_col: str,
    ids: DataFrame,
    cluster_col: str = "__ivf_cluster",
) -> int:
    """Anti-join deleted keys out of a cluster-partitioned parquet
    store, rewriting ONLY the touched cluster partitions (dynamic
    partition overwrite — the same touched-group discipline as the
    MIN/MAX IVM): a delete hitting 2 of 1024 clusters reads and
    rewrites 2 partitions, never the corpus. Fully-emptied
    partitions (dynamic overwrite leaves them untouched) are removed
    explicitly. Falls back to a full anti-join rewrite for
    un-partitioned legacy stores. Returns the deleted row count."""
    import os
    import shutil

    data = spark.read.parquet(data_path)
    ids = ids.select(id_col).distinct()
    if cluster_col not in data.columns:
        survivors = data.join(F.broadcast(ids), id_col, "left_anti")
        n_del = data.count() - survivors.count()
        if n_del:
            tmp = data_path + ".rewrite"
            survivors.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(data_path)
            os.replace(tmp, data_path)
        return int(n_del)
    hits = (
        data.select(id_col, cluster_col)
        .join(F.broadcast(ids), id_col, "left_semi")
        .groupBy(cluster_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if not hits:
        return 0
    touched = [r[cluster_col] for r in hits]
    n_del = int(sum(r["n"] for r in hits))
    sub = data.filter(F.col(cluster_col).isin(touched))
    survivors = sub.join(F.broadcast(ids), id_col, "left_anti")
    # stage survivors OUT of the store first (Spark refuses to
    # overwrite a path it is reading), then dynamic-overwrite only
    # the touched partitions from the staging copy
    staging = data_path + ".rewrite"
    survivors.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    (
        staged.repartition(F.col(cluster_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(cluster_col)
        .parquet(data_path)
    )
    remaining = {
        r[cluster_col]
        for r in staged.select(cluster_col).distinct().collect()
    }
    shutil.rmtree(staging, ignore_errors=True)
    for c in set(touched) - remaining:
        shutil.rmtree(
            os.path.join(data_path, f"{cluster_col}={c}"),
            ignore_errors=True,
        )
    return n_del


class _MaintenanceMeta:
    """Tiny JSON sidecar tracking delete churn since the last
    quantizer training — the staleness counter behind
    ``should_retrain`` (same metadata-only-policy shape as the table
    logs' ``should_compact``)."""

    def __init__(self, index_path: str):
        import os

        self._file = os.path.join(index_path, "_maintenance.json")

    def load(self) -> dict:
        import json
        import os

        if not os.path.exists(self._file):
            # genuinely missing = a fresh index: zero churn, no
            # batch cursor
            return {"deleted_since_train": 0}
        try:
            with open(self._file) as fh:
                return json.load(fh)
        except (OSError, ValueError) as e:
            # an EXISTING but unreadable/corrupt meta must not
            # silently reset to defaults: that would drop both the
            # accumulated churn counter AND the last_folded_batch
            # replay cursor — the next replayed micro-batch would
            # re-count its churn (the exact bug the cursor fixed).
            # The file is written atomically (tmp + os.replace), so
            # corruption means real damage — fail fast.
            raise ValueError(
                f"vector-index maintenance metadata {self._file} "
                "exists but is unreadable; refusing to reset the "
                "churn counter and replay cursor — repair or delete "
                "the file explicitly to start fresh"
            ) from e

    def _write(self, meta: dict) -> None:
        import json
        import os

        os.makedirs(os.path.dirname(self._file), exist_ok=True)
        tmp = self._file + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, self._file)

    def add_deleted(self, n: int) -> None:
        meta = self.load()
        meta["deleted_since_train"] = (
            int(meta.get("deleted_since_train") or 0) + int(n)
        )
        self._write(meta)

    def last_folded_batch(self) -> int | None:
        """Micro-batch id of the last CDC slice whose churn was
        counted — the idempotency cursor that keeps a checkpoint-
        replayed batch (its deletes/appends are key-idempotent) from
        inflating ``deleted_since_train`` and firing a premature
        retrain."""
        b = self.load().get("last_folded_batch")
        return int(b) if b is not None else None

    def mark_batch(self, batch_id: int) -> None:
        meta = self.load()
        meta["last_folded_batch"] = int(batch_id)
        self._write(meta)

    def reset(self) -> None:
        # retrain zeroes the churn counter but must keep the batch
        # cursor: a replay arriving right after a retrain would
        # otherwise re-count its deletes against the fresh quantizer
        meta = self.load()
        meta["deleted_since_train"] = 0
        self._write(meta)


@dataclass
class VectorIndexSource:
    """Parquet-backed vector index with write-time LSH bucketing."""

    path: str
    id_col: str = "id"
    vector_col: str = "embedding"
    dim: int = 16
    num_planes: int = 12
    num_tables: int = 3
    seed: int = 42

    def _bucket_cols(self) -> list[str]:
        return [f"__bucket_{t}" for t in range(self.num_tables)]

    def _with_buckets(self, df: DataFrame) -> DataFrame:
        # all tables' bucket ids in ONE Arrow kernel — bit-identical
        # to the per-table `lsh_bucket` codegen fold (same planes via
        # seed + t, same per-dimension IEEE accumulation order), but
        # without `num_tables x num_planes` interpreted HOF folds and
        # the thousands-of-literal-nodes expression tree they cost
        # the driver to analyze on every write
        df = df.withColumn(
            "__bks",
            _lsh_buckets_arrow(
                self.vector_col,
                self.dim,
                self.num_planes,
                self.num_tables,
                self.seed,
            ),
        )
        for t in range(self.num_tables):
            df = df.withColumn(
                f"__bucket_{t}", F.element_at("__bks", t + 1)
            )
        return df.drop("__bks")

    def _storage(self) -> ParquetSource:
        return ParquetSource(path=self.path)

    # -- UpdateVectorIndexJob (`retrieval_job.py:2131-2164`) -------------
    def update(self, df: DataFrame) -> None:
        """Upsert rows into the index, (re)computing bucket codes —
        the write-path hook the reference runs on insert."""
        self._storage().upsert(self._with_buckets(df), [self.id_col])

    def overwrite(self, df: DataFrame) -> None:
        self._storage().overwrite(self._with_buckets(df))

    def read(self, spark: SparkSession) -> DataFrame:
        return self._storage().read(spark)

    # -- nearest_n_to -----------------------------------------------------
    def nearest_n(
        self,
        queries: DataFrame,
        n: int = 10,
        exact: bool = False,
    ) -> DataFrame:
        """Top-``n`` index entries per query row by cosine.

        ``queries`` needs (``id_col``, ``vector_col``). The LSH path
        joins queries↔index on any shared bucket code (candidate
        pruning: expected candidates ≈ corpus/2^planes per table),
        then ranks exactly. Output: ``query_id, neighbor_id, sim``.
        """
        spark = queries.sparkSession
        index = self.read(spark)
        qs = self._with_buckets(
            queries.select(
                F.col(self.id_col).alias("query_id"),
                F.col(self.vector_col).cast("array<double>").alias("__qv"),
            ).withColumnRenamed("__qv", self.vector_col)
        ).withColumnRenamed(self.vector_col, "__qv")

        cs = index.select(
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vector_col).cast("array<double>").alias("__cv"),
            *self._bucket_cols(),
        )
        if exact:
            joined = cs.crossJoin(
                F.broadcast(qs.select("query_id", "__qv"))
            )
        else:
            cond = None
            for t in range(self.num_tables):
                c = qs[f"__bucket_{t}"] == cs[f"__bucket_{t}"]
                cond = c if cond is None else (cond | c)
            joined = cs.join(
                F.broadcast(qs), on=cond, how="inner"
            ).select("query_id", "__qv", "neighbor_id", "__cv")
            joined = joined.dropDuplicates(["query_id", "neighbor_id"])

        scored = joined.select(
            "query_id",
            "neighbor_id",
            # bit-identical vectorized twin of the interpreted
            # cosine_double fold (same IEEE accumulation order)
            _pair_cosine_arrow(joined, "__qv", "__cv").alias("sim"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .drop("__rk")
        )


@dataclass
class IvfIndexSource:
    """Parquet-backed IVF index: KMeans coarse quantizer trained at
    WRITE time, corpus stored partitioned by cluster.

    The write pays one clustering pass + one shuffle; every query
    then probes ``nprobe`` of ``num_centroids`` cluster partitions —
    partition pruning at the file level, so a probe reads
    ``nprobe / num_centroids`` of the corpus bytes. Centroids persist
    beside the data (a ``num_centroids × dim`` parquet — trivially
    small). Reference role: the LanceDB IVF index
    (``aligned/sources/lancedb.py:158-212``), minus the driver-side
    row loop."""

    path: str
    id_col: str = "id"
    vector_col: str = "embedding"
    num_centroids: int = 64
    seed: int = 42
    max_iter: int = 10

    def _data_path(self) -> str:
        return f"{self.path}/data"

    def _centroid_path(self) -> str:
        return f"{self.path}/centroids"

    def overwrite(self, df: DataFrame) -> None:
        from aligned_spark.operators.similarity import ivf_assign

        assigned, centers = ivf_assign(
            df, self.vector_col, self.num_centroids, self.seed, self.max_iter
        )
        (
            assigned.repartition(F.col("__ivf_cluster"))
            .write.mode("overwrite")
            .partitionBy("__ivf_cluster")
            .parquet(self._data_path())
        )
        spark = df.sparkSession
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(centers)],
            "__ivf_cluster int, __cent array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(self._centroid_path())
        _MaintenanceMeta(self.path).reset()  # fresh quantizer

    def update(self, df: DataFrame) -> None:
        """Incremental ingest: assign new vectors to the EXISTING
        centroids (no KMeans re-run — FAISS ``add()`` semantics) and
        append them to their cluster partitions. Frozen centroids
        drift from the true cluster means as the corpus grows;
        re-train with :meth:`overwrite` when recall degrades — the
        standard IVF maintenance trade."""
        from aligned_spark.operators.similarity import ivf_assign_to

        centers = self.centroids(df.sparkSession)
        assigned = ivf_assign_to(df, self.vector_col, centers)
        (
            assigned.repartition(F.col("__ivf_cluster"))
            .write.mode("append")
            .partitionBy("__ivf_cluster")
            .parquet(self._data_path())
        )

    def delete(
        self, ids: DataFrame, count_churn: bool = True
    ) -> int:
        """CDC-driven index maintenance, delete side (reference:
        ``UpdateVectorIndexJob``, aligned/retrieval_job.py:2131-2164
        keeps the index in sync on writes): anti-join the deleted
        keys out of the cluster partitions, rewriting ONLY the
        touched clusters. Tracks churn for :meth:`should_retrain`
        unless ``count_churn`` is off (checkpoint-replayed batches —
        the delete itself is key-idempotent, the counter is not)."""
        n = _delete_from_clustered(
            ids.sparkSession, self._data_path(), self.id_col, ids
        )
        if n and count_churn:
            _MaintenanceMeta(self.path).add_deleted(n)
        return n

    def apply_changes(
        self,
        changes: DataFrame,
        auto_retrain: bool = True,
        batch_id: int | None = None,
    ) -> None:
        """Fold a CDC slice (``_change_type`` column — e.g. a
        ``readChangeFeed`` micro-batch) into the index: deleted keys
        and update preimages leave their cluster partitions, inserts
        and update postimages assign to the frozen centroids and
        append — so an updated vector moves cluster correctly.
        ``auto_retrain`` (default on) runs :meth:`maybe_retrain`
        after delete churn, so quantizer drift control rides the
        maintenance pipeline instead of a separate cron (the same
        policy-with-a-trigger discipline as table auto-compaction)."""
        import os

        ins = F.col("_change_type").isin(
            "insert", "update_postimage"
        )
        adds = changes.filter(ins).select(
            self.id_col, self.vector_col
        )
        if not os.path.exists(self._centroid_path()):
            # bootstrap: the first slice of a default-start change
            # stream is the current snapshot as inserts — it IS the
            # corpus, so it trains the quantizer
            if not changes.filter(~ins).isEmpty():
                raise ValueError(
                    "no index exists to apply deletes to — build "
                    "with overwrite() or start the change stream at "
                    "the current snapshot (default)"
                )
            if not adds.isEmpty():
                self.overwrite(adds)
            if batch_id is not None:
                _MaintenanceMeta(self.path).mark_batch(batch_id)
            return
        meta = _MaintenanceMeta(self.path)
        last_b = meta.last_folded_batch()
        replayed = (
            batch_id is not None
            and last_b is not None
            and batch_id <= last_b
        )
        dels = changes.filter(~ins).select(self.id_col)
        had_dels = not dels.isEmpty()
        if had_dels:
            # a replayed batch's deletes are key-idempotent (the
            # prior attempt's re-appends get re-deleted, then
            # re-appended below) but must NOT re-count churn —
            # double-counting fires should_retrain prematurely
            self.delete(dels, count_churn=not replayed)
        if not adds.isEmpty():
            # replay safety: a checkpoint-replayed micro-batch must
            # not re-append rows the previous attempt landed — keys
            # already present are skipped (id-column-pruned scan;
            # preimage deletes already removed genuinely-updated
            # keys, so this never swallows a real update)
            spark = changes.sparkSession
            fresh = adds.join(
                self.read(spark).select(self.id_col),
                self.id_col,
                "left_anti",
            )
            if not fresh.isEmpty():
                self.update(fresh)
        if batch_id is not None and not replayed:
            meta.mark_batch(batch_id)
        if auto_retrain and had_dels:
            self.maybe_retrain(changes.sparkSession)

    def maintain_continuously(
        self,
        spark: SparkSession,
        table_path: str,
        checkpoint: str,
        auto_retrain: bool = True,
    ):
        """One-call wiring of CONTINUOUS index maintenance: the base
        table's commit log → ``readChangeFeed`` stream →
        ``foreachBatch`` → :meth:`apply_changes` (+ drift-triggered
        retrain). Returns the started ``StreamingQuery``; the
        checkpoint makes restarts exactly-once at the micro-batch
        level (apply_changes is idempotent per key for replayed
        delete/upsert slices)."""
        from aligned_spark.streaming.sources import TableStreamSource

        src = TableStreamSource(
            path=table_path,
            table_format="delta",
            read_change_feed=True,
        )
        return (
            src.read_stream(spark)
            .writeStream.foreachBatch(
                # batch id = churn-counter idempotency cursor
                lambda bdf, bid: self.apply_changes(
                    bdf, auto_retrain=auto_retrain, batch_id=bid
                )
            )
            .option("checkpointLocation", checkpoint)
            .start()
        )

    def should_retrain(
        self, spark: SparkSession, max_deleted_ratio: float = 0.2
    ) -> bool:
        """True when delete churn since the last KMeans training
        crosses the threshold — frozen centroids (and their cluster
        balance) degrade as the corpus they were fit on erodes. One
        metadata read + one count of the index."""
        dead = int(
            _MaintenanceMeta(self.path).load().get(
                "deleted_since_train"
            )
            or 0
        )
        if not dead:
            return False
        live = self.read(spark).count()
        return dead / max(1, live + dead) >= max_deleted_ratio

    def maybe_retrain(
        self, spark: SparkSession, max_deleted_ratio: float = 0.2
    ) -> bool:
        """Re-cluster from the surviving corpus iff
        :meth:`should_retrain` — the compaction-policy shape applied
        to quantizer drift."""
        import shutil
        import tempfile

        if not self.should_retrain(spark, max_deleted_ratio):
            return False
        # materialize the survivors OUT of the store first: the
        # retrain overwrite targets the path being read
        staging = tempfile.mkdtemp(prefix="ivf_retrain_")
        self.read(spark).select(
            self.id_col, self.vector_col
        ).write.mode("overwrite").parquet(staging)
        try:
            self.overwrite(spark.read.parquet(staging))
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return True

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self._data_path())

    def centroids(self, spark: SparkSession) -> "list[list[float]]":
        rows = (
            spark.read.parquet(self._centroid_path())
            .orderBy("__ivf_cluster")
            .collect()
        )
        return [list(r["__cent"]) for r in rows]

    def nearest_n(
        self, queries: DataFrame, n: int = 10, nprobe: int = 8
    ) -> DataFrame:
        """Probe the stored index. ``nprobe == num_centroids`` is
        exact; smaller prunes cluster partitions (the cluster-key
        filter reaches the parquet scan as partition pruning)."""
        from aligned_spark.operators.similarity import ivf_topk

        spark = queries.sparkSession
        assigned = self.read(spark)
        return ivf_topk(
            queries,
            assigned,
            self.id_col,
            self.vector_col,
            k=n,
            num_centroids=self.num_centroids,
            nprobe=nprobe,
            seed=self.seed,
            assigned=assigned,
            centers=self.centroids(spark),
        )


def _save_codebooks(spark: SparkSession, books, path: str) -> None:
    """Flatten an (m, k, dsub) codebook array into a tiny parquet."""
    mm, kk, _ = books.shape
    spark.createDataFrame(
        [
            (mi, ci, [float(v) for v in books[mi, ci]])
            for mi in range(mm)
            for ci in range(kk)
        ],
        "m int, c int, cent array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _load_codebooks(spark: SparkSession, path: str):
    import numpy as np

    rows = spark.read.parquet(path).collect()
    if not rows:
        raise ValueError(f"empty codebook table at {path}")
    mm = max(r["m"] for r in rows) + 1
    kk = max(r["c"] for r in rows) + 1
    books = np.empty((mm, kk, len(rows[0]["cent"])))
    for r in rows:
        books[r["m"], r["c"]] = r["cent"]
    return books


@dataclass
class PqIndexSource:
    """Parquet-backed PQ index: codebooks trained on a bounded
    sample at write time, the corpus stored as M-byte codes — a
    64-float vector compresses ~32× and queries score via ADC table
    lookups (`operators/similarity.py:pq_train/pq_encode/pq_topk`).
    Compose with IVF (cluster-partitioned codes) for the full IVF-PQ
    posture; standalone PQ already bounds scan bytes by the code
    width instead of the vector width."""

    path: str
    id_col: str = "id"
    vector_col: str = "embedding"
    m: int = 8
    k: int = 256
    sample: int = 50_000
    seed: int = 42

    def _codes_path(self) -> str:
        return f"{self.path}/codes"

    def _books_path(self) -> str:
        return f"{self.path}/codebooks"

    def _vectors_path(self) -> str:
        return f"{self.path}/vectors"

    def overwrite(self, df: DataFrame) -> None:
        from aligned_spark.operators.similarity import (
            pq_encode,
            pq_train,
        )

        books = pq_train(
            df,
            self.vector_col,
            m=self.m,
            k=self.k,
            sample=self.sample,
            seed=self.seed,
        )
        codes = pq_encode(df, self.id_col, self.vector_col, books)
        codes.write.mode("overwrite").parquet(self._codes_path())
        # raw vectors kept beside the codes for the refine stage's
        # point lookups (only shortlisted ids are ever read back)
        df.select(
            F.col(self.id_col).alias("id"),
            F.col(self.vector_col).alias("vec"),
        ).write.mode("overwrite").parquet(self._vectors_path())
        _save_codebooks(df.sparkSession, books, self._books_path())

    def codebooks(self, spark: SparkSession):
        return _load_codebooks(spark, self._books_path())

    def nearest_n(
        self, queries: DataFrame, n: int = 10, refine: int = 0
    ) -> DataFrame:
        """ADC top-n; ``refine=r`` re-ranks the ADC top ``n*r``
        shortlist by true cosine against the stored vectors (point
        lookups) — near-exact recall while the corpus pass still
        reads only codes."""
        from aligned_spark.operators.similarity import pq_topk

        spark = queries.sparkSession
        vectors = (
            spark.read.parquet(self._vectors_path())
            .withColumnsRenamed({"vec": self.vector_col, "id": self.id_col})
            if refine
            else None
        )
        return pq_topk(
            queries,
            spark.read.parquet(self._codes_path()),
            self.id_col,
            self.vector_col,
            self.codebooks(spark),
            k=n,
            refine=refine,
            corpus_vectors=vectors,
        )


@dataclass
class IvfPqIndexSource:
    """IVF-PQ — the standard web-scale ANN index (Jégou et al.;
    FAISS `IVFx,PQy`; the reference's LanceDB `IVF_PQ` index):

    - **IVF**: a KMeans coarse quantizer partitions the corpus by
      nearest centroid; the codes table is WRITTEN partitioned by
      cluster, so a query probing ``nprobe`` of ``num_centroids``
      clusters prunes the rest at the FILE level.
    - **PQ on residuals**: each vector's offset from its cluster
      centroid is product-quantized (residuals are smaller and
      better-conditioned than raw vectors — the textbook choice), so
      the probed partitions scan M-byte codes, not D-float vectors.
    - **ADC**: per (query, probed-cluster) a (m, k) lookup table of
      sub-distances is built driver-side (tiny: nq x nprobe x m x k
      floats) and broadcast; scoring a row is M lookups.
    - ``refine=r`` re-ranks the top ``n*r`` by true cosine against
      point-looked-up vectors.

    Scan cost: ``nprobe/num_centroids`` of the corpus FILES x
    ``m_bytes/d_floats`` of their bytes."""

    path: str
    id_col: str = "id"
    vector_col: str = "embedding"
    num_centroids: int = 16
    m: int = 8
    k: int = 256
    sample: int = 50_000
    seed: int = 42

    def _p(self, sub: str) -> str:
        return f"{self.path}/{sub}"

    def overwrite(self, df: DataFrame) -> None:
        from aligned_spark.operators.similarity import (
            ivf_assign,
            pq_encode,
            pq_train,
        )

        spark = df.sparkSession
        # assign clusters in NORMALIZED space — queries probe with
        # normalized vectors, so a raw-space assignment would put a
        # non-unit-norm corpus vector in a cluster its normalized
        # twin never probes (pruned partition → silent recall loss)
        norm = F.sqrt(
            F.aggregate(
                F.col(self.vector_col).cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        )
        dfn = df.withColumn(
            "__nvec",
            F.transform(
                F.col(self.vector_col).cast("array<double>"),
                lambda x: x / F.greatest(norm, F.lit(1e-12)),
            ),
        )
        assigned, centers = ivf_assign(
            dfn, "__nvec", self.num_centroids, self.seed
        )
        cent_df = spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
            "__ivf_cluster int, __cent array<double>",
        )
        # residual = normalized vector - its cluster centroid
        resid = assigned.join(
            F.broadcast(cent_df), "__ivf_cluster"
        ).withColumn(
            "__resid",
            F.zip_with(
                F.col("__nvec"),
                F.col("__cent"),
                lambda v, c: v - c,
            ),
        )
        books = pq_train(
            resid,
            "__resid",
            m=self.m,
            k=self.k,
            sample=self.sample,
            seed=self.seed,
            normalize=False,
        )
        codes = pq_encode(
            resid, self.id_col, "__resid", books, normalize=False
        ).join(
            resid.select(
                F.col(self.id_col).alias("id"), "__ivf_cluster"
            ),
            "id",
        )
        (
            codes.repartition(F.col("__ivf_cluster"))
            .write.mode("overwrite")
            .partitionBy("__ivf_cluster")
            .parquet(self._p("codes"))
        )
        cent_df.coalesce(1).write.mode("overwrite").parquet(
            self._p("centroids")
        )
        _save_codebooks(spark, books, self._p("books"))
        # refinement vectors ride the SAME cluster partitioning as
        # the codes, so a delete rewrites only touched partitions of
        # both stores (the refine join is unaffected — it semi-joins
        # by id)
        (
            resid.select(
                F.col(self.id_col).alias("id"),
                F.col(self.vector_col).alias("vec"),
                "__ivf_cluster",
            )
            .repartition(F.col("__ivf_cluster"))
            .write.mode("overwrite")
            .partitionBy("__ivf_cluster")
            .parquet(self._p("vectors"))
        )
        _MaintenanceMeta(self.path).reset()  # fresh quantizers

    def _load(self, spark: SparkSession):
        import numpy as np

        cents = {
            r["__ivf_cluster"]: np.asarray(r["__cent"])
            for r in spark.read.parquet(self._p("centroids")).collect()
        }
        return cents, _load_codebooks(spark, self._p("books"))

    def update(self, df: DataFrame) -> None:
        """Incremental ingest: normalize, assign to the EXISTING
        coarse centroids, product-quantize the residuals with the
        EXISTING codebooks, and append codes + vectors to their
        cluster partitions — no KMeans/PQ re-training (FAISS
        ``add()`` semantics). Frozen quantizers drift as the corpus
        grows; re-train with :meth:`overwrite` when recall
        degrades."""
        from aligned_spark.operators.similarity import (
            ivf_assign_to,
            pq_encode,
        )

        spark = df.sparkSession
        cents, books = self._load(spark)
        cid = sorted(cents)
        centers = [list(cents[c]) for c in cid]
        norm = F.sqrt(
            F.aggregate(
                F.col(self.vector_col).cast("array<double>"),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        )
        dfn = df.withColumn(
            "__nvec",
            F.transform(
                F.col(self.vector_col).cast("array<double>"),
                lambda x: x / F.greatest(norm, F.lit(1e-12)),
            ),
        )
        assigned = ivf_assign_to(dfn, "__nvec", centers).withColumn(
            # ivf_assign_to yields POSITIONS in `centers`; map back
            # to the stored cluster ids (dense in practice, but the
            # mapping keeps this correct for any id set)
            "__ivf_cluster",
            F.element_at(
                F.array(*[F.lit(int(c)) for c in cid]),
                F.col("__ivf_cluster") + 1,
            ),
        )
        cent_df = spark.createDataFrame(
            [(int(c), [float(v) for v in cents[c]]) for c in cid],
            "__ivf_cluster int, __cent array<double>",
        )
        resid = assigned.join(
            F.broadcast(cent_df), "__ivf_cluster"
        ).withColumn(
            "__resid",
            F.zip_with(
                F.col("__nvec"), F.col("__cent"), lambda v, c: v - c
            ),
        )
        codes = pq_encode(
            resid, self.id_col, "__resid", books, normalize=False
        ).join(
            resid.select(
                F.col(self.id_col).alias("id"), "__ivf_cluster"
            ),
            "id",
        )
        (
            codes.repartition(F.col("__ivf_cluster"))
            .write.mode("append")
            .partitionBy("__ivf_cluster")
            .parquet(self._p("codes"))
        )
        (
            resid.select(
                F.col(self.id_col).alias("id"),
                F.col(self.vector_col).alias("vec"),
                "__ivf_cluster",
            )
            .repartition(F.col("__ivf_cluster"))
            .write.mode("append")
            .partitionBy("__ivf_cluster")
            .parquet(self._p("vectors"))
        )

    def delete(
        self, ids: DataFrame, count_churn: bool = True
    ) -> int:
        """Delete keys from BOTH cluster-partitioned stores (codes +
        refinement vectors), rewriting only touched cluster
        partitions — :meth:`IvfIndexSource.delete` discipline.
        Legacy un-partitioned vector stores fall back to a full
        anti-join rewrite (sound either way)."""
        spark = ids.sparkSession
        keyed = ids.select(
            F.col(self.id_col).alias("id")
        ).distinct()
        n = _delete_from_clustered(
            spark, self._p("codes"), "id", keyed
        )
        _delete_from_clustered(
            spark, self._p("vectors"), "id", keyed
        )
        if n and count_churn:
            _MaintenanceMeta(self.path).add_deleted(n)
        return n

    def apply_changes(
        self,
        changes: DataFrame,
        auto_retrain: bool = True,
        batch_id: int | None = None,
    ) -> None:
        """Fold a CDC slice into the index — deletes/update
        preimages leave their partitions, inserts/update postimages
        quantize against the frozen codebooks and append
        (:meth:`IvfIndexSource.apply_changes` semantics, incl.
        bootstrap-from-snapshot, replayed-batch dedup, churn-counter
        idempotency keyed on ``batch_id``, and drift-triggered
        retrain)."""
        import os

        ins = F.col("_change_type").isin(
            "insert", "update_postimage"
        )
        adds = changes.filter(ins).select(
            self.id_col, self.vector_col
        )
        if not os.path.exists(self._p("centroids")):
            if not changes.filter(~ins).isEmpty():
                raise ValueError(
                    "no index exists to apply deletes to — build "
                    "with overwrite() or start the change stream at "
                    "the current snapshot (default)"
                )
            if not adds.isEmpty():
                self.overwrite(adds)
            if batch_id is not None:
                _MaintenanceMeta(self.path).mark_batch(batch_id)
            return
        meta = _MaintenanceMeta(self.path)
        last_b = meta.last_folded_batch()
        replayed = (
            batch_id is not None
            and last_b is not None
            and batch_id <= last_b
        )
        dels = changes.filter(~ins).select(self.id_col)
        had_dels = not dels.isEmpty()
        if had_dels:
            self.delete(dels, count_churn=not replayed)
        if not adds.isEmpty():
            spark = changes.sparkSession
            fresh = adds.join(
                spark.read.parquet(self._p("codes"))
                .select(F.col("id").alias(self.id_col)),
                self.id_col,
                "left_anti",
            )
            if not fresh.isEmpty():
                self.update(fresh)
        if batch_id is not None and not replayed:
            meta.mark_batch(batch_id)
        if auto_retrain and had_dels:
            self.maybe_retrain(changes.sparkSession)

    def should_retrain(
        self, spark: SparkSession, max_deleted_ratio: float = 0.2
    ) -> bool:
        """Quantizer-drift trigger: delete churn since the last
        KMeans/PQ training vs the live corpus (metadata + one
        count)."""
        dead = int(
            _MaintenanceMeta(self.path).load().get(
                "deleted_since_train"
            )
            or 0
        )
        if not dead:
            return False
        live = spark.read.parquet(self._p("codes")).count()
        return dead / max(1, live + dead) >= max_deleted_ratio

    def maybe_retrain(
        self, spark: SparkSession, max_deleted_ratio: float = 0.2
    ) -> bool:
        """Re-train coarse centroids + codebooks from the surviving
        vectors iff :meth:`should_retrain`."""
        import shutil
        import tempfile

        if not self.should_retrain(spark, max_deleted_ratio):
            return False
        staging = tempfile.mkdtemp(prefix="ivfpq_retrain_")
        (
            spark.read.parquet(self._p("vectors"))
            .select(
                F.col("id").alias(self.id_col),
                F.col("vec").alias(self.vector_col),
            )
            .write.mode("overwrite")
            .parquet(staging)
        )
        try:
            self.overwrite(spark.read.parquet(staging))
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return True

    def nearest_n(
        self,
        queries: DataFrame,
        n: int = 10,
        nprobe: int = 4,
        refine: int = 0,
    ) -> DataFrame:
        import numpy as np
        import pandas as pd

        from aligned_spark.operators.similarity import (
            _pq_normalize,
            cosine_double,
        )

        spark = queries.sparkSession
        cents, books = self._load(spark)
        mm, kk, dsub = books.shape
        qrows = queries.select(
            F.col(self.id_col).alias("qid"),
            F.col(self.vector_col).alias("qv"),
        ).collect()
        qids = [r["qid"] for r in qrows]
        qx = _pq_normalize(
            np.asarray(
                [np.asarray(r["qv"], dtype=np.float64) for r in qrows]
            )
        )
        nq = len(qids)
        cid = sorted(cents)
        cmat = np.stack([cents[c] for c in cid])
        # nprobe nearest centroids per query (tiny driver matmul)
        d2c = ((qx[:, None, :] - cmat[None, :, :]) ** 2).sum(-1)
        probe_ix = np.argsort(d2c, axis=1)[:, :nprobe]
        probes = {
            int(cid[c]): [
                qi for qi in range(nq) if c in probe_ix[qi]
            ]
            for c in set(probe_ix.ravel())
        }
        # per (query, probed cluster) ADC tables over RESIDUALS
        tables = {}
        for c, qlist in probes.items():
            res = qx[qlist] - cents[c][None, :]
            t = np.empty((len(qlist), mm, kk))
            for mi in range(mm):
                sub = res[:, mi * dsub : (mi + 1) * dsub]
                t[:, mi, :] = (
                    (sub[:, None, :] - books[mi][None, :, :]) ** 2
                ).sum(-1)
            tables[c] = (qlist, t)
        cand_k = n * refine if refine else n

        def _scan(batches):
            for pdf in batches:
                for c, grp in pdf.groupby("__ivf_cluster"):
                    hit = tables.get(int(c))
                    if hit is None:
                        continue
                    qlist, t = hit
                    ids = grp["id"].to_numpy()
                    codes = np.asarray(
                        list(grp["__pq_code"]), dtype=np.int64
                    )
                    dist = np.zeros((len(qlist), len(ids)))
                    for mi in range(mm):
                        dist += t[:, mi, :][:, codes[:, mi]]
                    kk_local = min(cand_k, len(ids))
                    top = np.argpartition(
                        dist, kk_local - 1, axis=1
                    )[:, :kk_local]
                    yield pd.DataFrame(
                        {
                            "qix": np.repeat(qlist, kk_local),
                            "id": ids[top].ravel(),
                            "pq_dist": np.take_along_axis(
                                dist, top, 1
                            ).ravel(),
                        }
                    )

        codes_df = spark.read.parquet(self._p("codes"))
        probed = codes_df.filter(
            F.col("__ivf_cluster").isin([int(c) for c in probes])
        )  # cluster-key filter -> partition pruning at the scan
        cand = probed.mapInPandas(
            _scan, "qix int, id long, pq_dist double"
        )
        qmap = spark.createDataFrame(
            [(i, int(q)) for i, q in enumerate(qids)],
            "qix int, query_id long",
        )
        w = W.partitionBy("qix").orderBy(
            F.col("pq_dist").asc(), F.col("id").asc()
        )
        shortlist = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= cand_k)
            .join(F.broadcast(qmap), "qix")
        )
        if not refine:
            return shortlist.select("query_id", "id", "pq_dist", "rank")
        qvec = spark.createDataFrame(
            [(i, [float(v) for v in qx[i]]) for i in range(nq)],
            "qix int, __qv array<double>",
        )
        vecs = spark.read.parquet(self._p("vectors")).join(
            shortlist.select("id").distinct(), "id", "left_semi"
        )
        scored = (
            shortlist.select("qix", "query_id", "id")
            .join(vecs, "id")
            .join(F.broadcast(qvec), "qix")
            .select(
                "query_id",
                "id",
                cosine_double(
                    F.col("__qv"), F.col("vec").cast("array<double>")
                ).alias("sim"),
            )
        )
        rw = W.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(rw))
            .filter(F.col("rank") <= n)
            .select("query_id", "id", "sim", "rank")
        )
