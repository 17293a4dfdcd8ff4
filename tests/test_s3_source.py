"""S3 source (`sources/s3.py`) against moto's in-process S3 — the
same emulation standard the JDBC source meets via embedded Derby."""

import pytest

from pyspark.sql import Row

moto = pytest.importorskip("moto")


@pytest.fixture()
def s3_env(tmp_path):
    from moto import mock_aws

    with mock_aws():
        import boto3

        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="data")
        yield client


def _src(client, tmp_path, **kw):
    from aligned_spark.sources.s3 import S3Source

    kw.setdefault("bucket", "data")
    kw.setdefault("prefix", "tbl")
    kw.setdefault("client_factory", lambda: client)
    kw.setdefault("spill_dir", str(tmp_path / "spill"))
    return S3Source(**kw)


def test_csv_roundtrip(spark, s3_env, tmp_path):
    s3_env.put_object(
        Bucket="data",
        Key="tbl/part1.csv",
        Body=b"k,v\n1,a\n2,b\n",
    )
    s3_env.put_object(
        Bucket="data",
        Key="tbl/part2.csv",
        Body=b"k,v\n3,c\n",
    )
    src = _src(s3_env, tmp_path, format="csv")
    df = src.read(spark)
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]


def test_parquet_write_read_upsert(spark, s3_env, tmp_path):
    src = _src(s3_env, tmp_path, format="parquet")
    src.insert(spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]))
    assert src.read(spark).count() == 2
    src.upsert(
        spark.createDataFrame([Row(k=2, v="B"), Row(k=3, v="c")]),
        keys=["k"],
    )
    got = {r.k: r.v for r in src.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_etag_cache_skips_refetch(spark, s3_env, tmp_path, monkeypatch):
    src = _src(s3_env, tmp_path, format="csv")
    s3_env.put_object(Bucket="data", Key="tbl/a.csv", Body=b"k\n1\n")
    src.read(spark)
    calls = {"n": 0}
    orig = s3_env.download_file

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(s3_env, "download_file", counting)
    src.read(spark)  # unchanged etag → no network transfer
    assert calls["n"] == 0
    # changed object → new etag → refetch
    s3_env.put_object(Bucket="data", Key="tbl/a.csv", Body=b"k\n1\n2\n")
    assert src.read(spark).count() == 2
    assert calls["n"] == 1


def test_missing_prefix_raises(spark, s3_env, tmp_path):
    src = _src(s3_env, tmp_path, prefix="nope")
    with pytest.raises(FileNotFoundError):
        src.read(spark)


def test_s3_source_serde_roundtrip():
    """Contract catalogs can carry S3/Azure sources: the injectable
    client factory is runtime wiring — omitted at its default,
    refused when custom-injected."""
    import pytest as _pytest

    from aligned_spark.serde import _source_from_dict, _source_to_dict
    from aligned_spark.sources.azure_blob import AzureBlobSource
    from aligned_spark.sources.s3 import S3Source

    src = S3Source(bucket="b", prefix="p", format="csv")
    back = _source_from_dict(_source_to_dict(src))
    assert (back.bucket, back.prefix, back.format) == ("b", "p", "csv")
    assert callable(back.client_factory)
    az = AzureBlobSource(prefix="q")
    back2 = _source_from_dict(_source_to_dict(az))
    assert back2.prefix == "q"
    with _pytest.raises(ValueError, match="injected callable"):
        _source_to_dict(
            S3Source(bucket="b", prefix="p", client_factory=lambda: 1)
        )
