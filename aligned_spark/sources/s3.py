"""S3 object-storage source (reference ``AwsS3CsvDataSource`` /
``AwsS3ParquetDataSource``, ``aligned/sources/s3.py:217``).

Two tiers, chosen by what the environment provides:

- **Executor-side (`s3a://`)** — when the hadoop-aws jars are on the
  Spark classpath, S3 is just a Hadoop filesystem scheme: pass the
  URI to the plain file sources and every executor reads its own
  splits. That is the 100 TB path; nothing here is involved.
- **Driver-side (this module)** — when the jars are ABSENT (this
  container), objects are transferred through boto3 on the driver to
  a local spill directory and read from there. This mirrors the
  REFERENCE's own posture (its S3 sources stream through
  s3fs/aioaws into a single Polars process,
  ``aligned/storage.py:24-41``) — appropriate for the
  config/dimension/medium-table tier, not for petabyte fact tables;
  the docstring cost model is part of the contract. Transfers run in
  a thread pool (S3 GET is latency-bound), and the spill directory
  is content-addressed by (bucket, key, etag) so repeated reads of
  unchanged objects skip the network entirely.

Credentials follow the standard boto3 chain; tests inject a moto
(``mock_aws``) client through ``client_factory``.
"""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource

_TRANSFER_THREADS = 16


def _default_client_factory():
    import boto3

    return boto3.client("s3")


@dataclass
class S3Source(WritableSource):
    """CSV or parquet objects under ``s3://bucket/prefix``."""

    bucket: str
    prefix: str
    format: str = "parquet"  # or "csv"
    csv_options: dict[str, str] = field(
        default_factory=lambda: {"header": "true", "inferSchema": "true"}
    )
    mapping_keys: dict[str, str] = field(default_factory=dict)
    #: injectable for tests (moto) / custom endpoints
    client_factory: Callable[[], Any] = _default_client_factory
    spill_dir: str | None = None

    def job_group_key(self) -> str:
        return f"s3:{self.bucket}/{self.prefix}"

    # ---------------------------------------------------------- util

    def _spill(self) -> str:
        # do NOT assign self.spill_dir — the dataclass field is
        # contract state (serde serializes it into catalogs) and a
        # machine-local temp default must not leak there
        spill = self.spill_dir or os.path.join(
            tempfile.gettempdir(), "aligned_spark_s3_spill"
        )
        os.makedirs(spill, exist_ok=True)
        return spill

    def _list_keys(self, client) -> list[dict[str, str]]:
        out: list[dict[str, str]] = []
        paginator = client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=self.prefix
        ):
            for obj in page.get("Contents", []):
                if obj["Key"].endswith("/"):
                    continue
                out.append(
                    {"key": obj["Key"], "etag": obj["ETag"].strip('"')}
                )
        return out

    def _fetch(self, objs: list[dict[str, str]]) -> list[str]:
        """Download (etag-cached) → local paths."""
        client = self.client_factory()
        spill = self._spill()

        import uuid as _uuid

        from aligned_spark.sources.spill import evict_superseded

        def one(obj: dict[str, str]) -> str:
            safe = obj["key"].replace("/", "__")
            local = os.path.join(
                spill, f"{self.bucket}__{obj['etag']}__{safe}"
            )
            if not os.path.exists(local):
                # unique temp per attempt: a pid-keyed name would let
                # two THREADS of one process interleave writes and
                # publish a corrupt cache entry forever
                tmp = local + f".tmp-{_uuid.uuid4().hex}"
                client.download_file(self.bucket, obj["key"], tmp)
                # two-phase eviction of superseded generations:
                # mark now, delete after a grace window — earlier
                # read() calls returned LAZY frames that still
                # reference the old local paths (sources/spill.py)
                evict_superseded(
                    spill, f"{self.bucket}__*__{safe}", keep=local
                )
                os.replace(tmp, local)
            else:
                # cache hit: still run eviction so a file that became
                # current AGAIN sheds its stale .superseded marker
                # (else the next rewrite deletes it with no grace)
                evict_superseded(
                    spill, f"{self.bucket}__*__{safe}", keep=local
                )
            return local

        with ThreadPoolExecutor(_TRANSFER_THREADS) as pool:
            return list(pool.map(one, objs))

    # ---------------------------------------------------------- read

    def read(self, spark: SparkSession) -> DataFrame:
        client = self.client_factory()
        objs = self._list_keys(client)
        if not objs:
            raise FileNotFoundError(
                f"no objects under s3://{self.bucket}/{self.prefix}"
            )
        local = self._fetch(objs)
        if self.format == "parquet":
            df = spark.read.parquet(*local)
        elif self.format == "csv":
            df = spark.read.options(**self.csv_options).csv(local)
        else:
            raise ValueError(f"unknown format: {self.format!r}")
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    # --------------------------------------------------------- write

    def _upload_dir(self, local_dir: str, client) -> None:
        files = [
            os.path.join(r, n)
            for r, _d, ns in os.walk(local_dir)
            for n in ns
            if not n.startswith((".", "_"))
        ]

        def one(path: str) -> None:
            rel = os.path.relpath(path, local_dir).replace(os.sep, "/")
            client.upload_file(
                path, self.bucket, f"{self.prefix.rstrip('/')}/{rel}"
            )

        with ThreadPoolExecutor(_TRANSFER_THREADS) as pool:
            list(pool.map(one, files))

    def insert(self, df: DataFrame) -> None:
        """Append: write parts locally, upload with collision-free
        names (Spark part files already carry UUIDs)."""
        client = self.client_factory()
        with tempfile.TemporaryDirectory() as d:
            out = os.path.join(d, "out")
            if self.format == "parquet":
                df.write.parquet(out)
            else:
                df.write.options(**self.csv_options).csv(out)
            self._upload_dir(out, client)

    def overwrite(self, df: DataFrame, predicate=None) -> None:
        if predicate is not None:
            raise NotImplementedError(
                "predicate overwrite on S3 requires a table format — "
                "point DeltaSource at an s3a:// path with hadoop-aws"
            )
        client = self.client_factory()
        old = self._list_keys(client)
        self.insert(df)
        # delete the previous objects AFTER the new ones land —
        # briefly-duplicated data beats a window with none
        for obj in old:
            client.delete_object(Bucket=self.bucket, Key=obj["key"])

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        """Anti-join + union rewrite (same as the local parquet
        source; a real MERGE needs a table format on top)."""
        spark = df.sparkSession
        try:
            current = self.read(spark)
        except FileNotFoundError:
            self.insert(df)
            return
        survivors = current.join(
            df.select(*keys).distinct(), keys, "left_anti"
        )
        self.overwrite(survivors.unionByName(df.select(*current.columns)))
