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

from aligned_spark.operators.similarity import cosine_double, lsh_bucket
from aligned_spark.sources.file import ParquetSource


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
        for t in range(self.num_tables):
            df = df.withColumn(
                f"__bucket_{t}",
                lsh_bucket(
                    F.col(self.vector_col),
                    self.dim,
                    self.num_planes,
                    self.seed + t,
                ),
            )
        return df

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
            cosine_double(F.col("__qv"), F.col("__cv")).alias("sim"),
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= n)
            .drop("__rk")
        )
