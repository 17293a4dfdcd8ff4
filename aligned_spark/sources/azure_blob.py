"""Azure Blob Storage source (reference ``AzureBlobCsvDataSource`` /
``...ParquetDataSource``, ``aligned/sources/azure_blob_storage.py:176``).

Same two-tier shape as :class:`aligned_spark.sources.s3.S3Source`:

- **Executor-side (`abfss://`)** — with the hadoop-azure jars on the
  classpath, ABFS is a Hadoop filesystem scheme; the plain file
  sources read it directly. The 100 TB path.
- **Driver-side (this module)** — objects transfer through a blob
  client on the driver into an etag-content-addressed spill dir.
  The azure-storage-blob SDK is NOT in this container, so the
  default client factory is import-gated with a clear error; the
  CLIENT INTERFACE is four methods (``list_blobs``,
  ``download_blob``, ``upload_blob``, ``delete_blob``) and tests
  exercise the full
  read/write path with an injected in-memory implementation — the
  same injectable-transport standard as the HTTP source and the
  presigned-URL signer. When the SDK exists, the default factory
  adapts ``ContainerClient`` to the same interface.
"""

from __future__ import annotations

import os
import tempfile
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

from pyspark.sql import DataFrame, SparkSession

from aligned_spark.sources.base import WritableSource

_TRANSFER_THREADS = 16


class BlobClient(Protocol):
    """Minimal container-scoped blob interface (four methods)."""

    def list_blobs(self, prefix: str) -> list[dict[str, str]]:
        """→ [{"name": ..., "etag": ...}] under ``prefix``."""
        ...

    def download_blob(self, name: str, local_path: str) -> None: ...

    def upload_blob(self, name: str, local_path: str) -> None: ...

    def delete_blob(self, name: str) -> None: ...


def _default_client_factory() -> BlobClient:
    try:
        from azure.storage.blob import ContainerClient  # type: ignore
    except ImportError as exc:  # pragma: no cover — SDK absent here
        raise RuntimeError(
            "azure-storage-blob is not installed; either add it (and "
            "credentials) for the driver-side tier, or put the "
            "hadoop-azure jars on the classpath and read abfss:// "
            "paths with the plain file sources"
        ) from exc

    class _Adapter:  # pragma: no cover — SDK absent here
        def __init__(self) -> None:
            self.cc = ContainerClient.from_connection_string(
                os.environ["AZURE_STORAGE_CONNECTION_STRING"],
                os.environ["AZURE_STORAGE_CONTAINER"],
            )

        def list_blobs(self, prefix):
            return [
                {"name": b.name, "etag": b.etag.strip('"')}
                for b in self.cc.list_blobs(name_starts_with=prefix)
            ]

        def download_blob(self, name, local_path):
            with open(local_path, "wb") as fh:
                self.cc.download_blob(name).readinto(fh)

        def upload_blob(self, name, local_path):
            with open(local_path, "rb") as fh:
                self.cc.upload_blob(name, fh, overwrite=True)

        def delete_blob(self, name):
            self.cc.delete_blob(name)

    return _Adapter()


@dataclass
class AzureBlobSource(WritableSource):
    """CSV or parquet blobs under ``container/prefix``."""

    prefix: str
    format: str = "parquet"  # or "csv"
    csv_options: dict[str, str] = field(
        default_factory=lambda: {"header": "true", "inferSchema": "true"}
    )
    mapping_keys: dict[str, str] = field(default_factory=dict)
    client_factory: Callable[[], BlobClient] = _default_client_factory
    spill_dir: str | None = None

    def job_group_key(self) -> str:
        return f"azure:{self.prefix}"

    def _spill(self) -> str:
        # no self-assignment: the field is serde-visible contract
        # state (see S3Source._spill)
        spill = self.spill_dir or os.path.join(
            tempfile.gettempdir(), "aligned_spark_azure_spill"
        )
        os.makedirs(spill, exist_ok=True)
        return spill

    def _fetch(self, client: BlobClient, blobs) -> list[str]:
        spill = self._spill()

        import uuid as _uuid

        from aligned_spark.sources.spill import evict_superseded

        def one(b) -> str:
            safe = b["name"].replace("/", "__")
            local = os.path.join(spill, f"{b['etag']}__{safe}")
            if not os.path.exists(local):
                tmp = local + f".tmp-{_uuid.uuid4().hex}"
                client.download_blob(b["name"], tmp)
                # two-phase eviction: mark superseded generations
                # now, delete after a grace window — lazy frames
                # from earlier read() calls still reference the old
                # paths (sources/spill.py)
                evict_superseded(spill, f"*__{safe}", keep=local)
                os.replace(tmp, local)
            else:
                # cache hit: shed any stale marker on the again-
                # current generation (A→B→A rewrite pattern)
                evict_superseded(spill, f"*__{safe}", keep=local)
            return local

        with ThreadPoolExecutor(_TRANSFER_THREADS) as pool:
            return list(pool.map(one, blobs))

    def read(self, spark: SparkSession) -> DataFrame:
        client = self.client_factory()
        blobs = client.list_blobs(self.prefix)
        if not blobs:
            raise FileNotFoundError(
                f"no blobs under {self.prefix!r}"
            )
        local = self._fetch(client, blobs)
        if self.format == "parquet":
            df = spark.read.parquet(*local)
        elif self.format == "csv":
            df = spark.read.options(**self.csv_options).csv(local)
        else:
            raise ValueError(f"unknown format: {self.format!r}")
        if self.mapping_keys:
            df = df.withColumnsRenamed(self.mapping_keys)
        return df

    def insert(self, df: DataFrame) -> None:
        client = self.client_factory()
        with tempfile.TemporaryDirectory() as d:
            out = os.path.join(d, "out")
            if self.format == "parquet":
                df.write.parquet(out)
            else:
                df.write.options(**self.csv_options).csv(out)
            files = [
                os.path.join(r, n)
                for r, _d, ns in os.walk(out)
                for n in ns
                if not n.startswith((".", "_"))
            ]

            def one(path: str) -> None:
                rel = os.path.relpath(path, out).replace(os.sep, "/")
                client.upload_blob(
                    f"{self.prefix.rstrip('/')}/{rel}", path
                )

            with ThreadPoolExecutor(_TRANSFER_THREADS) as pool:
                list(pool.map(one, files))

    def overwrite(self, df: DataFrame, predicate: Any | None = None) -> None:
        if predicate is not None:
            raise NotImplementedError(
                "predicate overwrite needs a table format on top"
            )
        client = self.client_factory()
        old = client.list_blobs(self.prefix)
        self.insert(df)
        for b in old:
            client.delete_blob(b["name"])

    def upsert(self, df: DataFrame, keys: list[str]) -> None:
        spark = df.sparkSession
        try:
            current = self.read(spark)
        except FileNotFoundError:
            self.insert(df)
            return
        survivors = current.join(
            df.select(*keys).distinct(), keys, "left_anti"
        )
        self.overwrite(
            survivors.unionByName(df.select(*current.columns))
        )
