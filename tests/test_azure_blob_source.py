"""Azure blob source (`sources/azure_blob.py`) with an injected
in-memory client — the injectable-transport standard (HTTP source,
presigned signer); the azure SDK itself is absent here."""

import os
import shutil

import pytest

from pyspark.sql import Row


class FakeBlobClient:
    """In-memory container implementing the 4-method interface."""

    def __init__(self):
        self.blobs: dict[str, bytes] = {}
        self.downloads = 0

    def list_blobs(self, prefix):
        import hashlib

        return [
            {
                "name": k,
                "etag": hashlib.md5(v).hexdigest(),
            }
            for k, v in sorted(self.blobs.items())
            if k.startswith(prefix)
        ]

    def download_blob(self, name, local_path):
        self.downloads += 1
        with open(local_path, "wb") as fh:
            fh.write(self.blobs[name])

    def upload_blob(self, name, local_path):
        with open(local_path, "rb") as fh:
            self.blobs[name] = fh.read()

    def delete_blob(self, name):
        self.blobs.pop(name, None)


@pytest.fixture()
def fake():
    return FakeBlobClient()


def _src(fake, tmp_path, **kw):
    from aligned_spark.sources.azure_blob import AzureBlobSource

    kw.setdefault("prefix", "tbl")
    kw.setdefault("client_factory", lambda: fake)
    kw.setdefault("spill_dir", str(tmp_path / "spill"))
    return AzureBlobSource(**kw)


def test_csv_roundtrip(spark, fake, tmp_path):
    fake.blobs["tbl/a.csv"] = b"k,v\n1,a\n2,b\n"
    src = _src(fake, tmp_path, format="csv")
    assert sorted(
        (r.k, r.v) for r in src.read(spark).collect()
    ) == [(1, "a"), (2, "b")]


def test_parquet_write_upsert_overwrite(spark, fake, tmp_path):
    src = _src(fake, tmp_path)
    src.insert(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    assert src.read(spark).count() == 2
    before = set(fake.blobs)
    src.upsert(
        spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]),
        keys=["k"],
    )
    got = {r.k: r.v for r in src.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # the pre-upsert generation was deleted — no stale blobs remain
    # to double-count on the next read
    assert not (before & set(fake.blobs))


def test_etag_cache(spark, fake, tmp_path):
    fake.blobs["tbl/a.csv"] = b"k\n1\n"
    src = _src(fake, tmp_path, format="csv")
    src.read(spark)
    n = fake.downloads
    src.read(spark)  # same etag → spill hit, no transfer
    assert fake.downloads == n
    fake.blobs["tbl/a.csv"] = b"k\n1\n2\n"
    assert src.read(spark).count() == 2
    assert fake.downloads == n + 1


def test_default_factory_gates_clearly(spark):
    from aligned_spark.sources.azure_blob import AzureBlobSource

    src = AzureBlobSource(prefix="x")
    with pytest.raises(RuntimeError, match="azure-storage-blob"):
        src.read(spark)
