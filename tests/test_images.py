"""Image ops: fetch / decode / grayscale / presign plumbing.

Reference parity: ``aligned/schemas/transformation.py:2201-2283``
(LoadImageUrlBytes / LoadImageUrl / GrayscaleImage) and ``:2671``
(PresignedAwsUrl). No image codecs in this container — decode runs
through the deterministic fake unless a decoder is injected.
"""

import numpy as np
from pyspark.sql import functions as F

from aligned_spark.functions.images import (
    decode_image,
    grayscale_image,
    load_image_bytes,
    presigned_aws_url,
)


def test_load_image_bytes_injected_fetcher(spark):
    blobs = {"img/a.png": b"aaa-bytes", "img/b.png": b"bbb-bytes"}
    df = spark.createDataFrame(
        [("img/a.png",), ("img/b.png",), (None,)], "url string"
    )
    out = df.select(
        "url", load_image_bytes(F.col("url"), blobs.get).alias("data")
    ).collect()
    got = {r.url: bytes(r.data) if r.data is not None else None for r in out}
    assert got == {"img/a.png": b"aaa-bytes", "img/b.png": b"bbb-bytes", None: None}


def test_load_image_bytes_local_file(spark, tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"\x01\x02\x03")
    df = spark.createDataFrame([(str(p),)], "url string")
    r = df.select(load_image_bytes(F.col("url")).alias("d")).first()
    assert bytes(r.d) == b"\x01\x02\x03"


def test_decode_and_grayscale_known_tensor(spark):
    def decoder(data: bytes) -> np.ndarray:
        # 1×2×3 tensor derived from the first byte
        v = float(data[0])
        return np.array([[[v, v + 3.0, v + 6.0], [0.0, 1.0, 2.0]]])

    df = spark.createDataFrame([(b"\x09",)], "blob binary")
    out = df.select(
        grayscale_image(decode_image(F.col("blob"), decoder)).alias("g")
    ).first()
    # channel means: (9+12+15)/3 = 12, (0+1+2)/3 = 1
    assert out.g == [[12.0, 1.0]]


def test_fake_decode_deterministic(spark):
    df = spark.createDataFrame([(b"same",), (b"same",), (b"diff",)], "blob binary")
    rows = df.select(decode_image(F.col("blob")).alias("t")).collect()
    assert rows[0].t == rows[1].t
    assert rows[0].t != rows[2].t
    arr = np.asarray(rows[0].t)
    assert arr.shape == (8, 8, 3)
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_presigned_url_injected_signer(spark):
    df = spark.createDataFrame([("k1",), (None,)], "key string")
    out = df.select(
        presigned_aws_url(
            F.col("key"), "bkt", 60, signer=lambda k: f"https://bkt/{k}?sig=x"
        ).alias("u")
    ).collect()
    assert out[0].u == "https://bkt/k1?sig=x" and out[1].u is None


def test_image_contract_view(spark, tmp_path):
    from aligned_spark.contracts import EventTimestamp, ImageUrl, Int64, feature_view
    from aligned_spark.sources.in_memory import InMemorySource

    p1 = tmp_path / "a.img"
    p1.write_bytes(b"image-a")
    p2 = tmp_path / "b.img"
    p2.write_bytes(b"image-b")
    src = InMemorySource.from_dict(
        {"img_id": [1, 2], "url": [str(p1), str(p2)]},
        schema="img_id long, url string",
    )

    @feature_view(name="images", source=src)
    class Images:
        img_id = Int64().as_entity()
        url = ImageUrl()

        raw = url.load_bytes()
        tensor = url.load_image()
        gray = tensor.to_grayscale()

    from aligned_spark.store import ContractStore

    store = ContractStore(spark)
    store.add_view(Images)
    out = {r.img_id: r for r in store.feature_view("images").all().collect()}
    assert bytes(out[1].raw) == b"image-a"
    assert np.asarray(out[1].tensor).shape == (8, 8, 3)
    assert np.asarray(out[2].gray).shape == (8, 8)
    # grayscale really is the channel mean of the decoded tensor
    t = np.asarray(out[2].tensor)
    assert np.allclose(np.asarray(out[2].gray), t.mean(axis=2))


def test_resize_image_nearest(spark):
    """Non-null tensors only: the container's pyarrow segfaults on
    null/empty rows of depth-3 arrays through ANY pandas UDF (even
    identity) — see the resize_image docstring caveat."""
    from aligned_spark.functions.images import resize_image

    t = [[[float(r * 10 + c)] * 3 for c in range(4)] for r in range(4)]
    t2 = [[[7.0] * 3 for _ in range(3)] for _ in range(5)]
    df = spark.createDataFrame(
        [(1, t), (2, t2)],
        "img_id long, tensor array<array<array<double>>>",
    )
    out = {r.img_id: r.small for r in df.withColumn(
        "small", resize_image(F.col("tensor"), 2, 2)
    ).collect()}
    small = np.asarray(out[1])
    assert small.shape == (2, 2, 3)
    # nearest-neighbor picks rows/cols 0 and 2
    assert small[:, :, 0].tolist() == [[0.0, 2.0], [20.0, 22.0]]
    assert np.asarray(out[2]).shape == (2, 2, 3)
    # resize chains off decode in one plan (the supported pattern)
    from aligned_spark.functions.images import decode_image
    bdf = spark.createDataFrame([(b"xy",)], "blob binary")
    r = bdf.select(
        resize_image(decode_image(F.col("blob")), 4, 4).alias("t")
    ).first()
    assert np.asarray(r.t).shape == (4, 4, 3)


def test_image_dhash_reference_and_dedup(spark):
    """dHash matches a pure-python replay of the fake codec; equal
    bytes → equal hash; different bytes → (overwhelmingly) different
    hash; 56-bit range respected."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from aligned_spark.functions.images import (
        decode_image,
        grayscale_image,
        image_dhash,
    )

    rows = [(0, b"same bytes"), (1, b"same bytes"), (2, b"other")]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    gray = df.select(
        "doc_id", grayscale_image(decode_image(F.col("blob"))).alias("g")
    )
    out = {
        r.doc_id: r.h
        for r in gray.select(
            "doc_id", image_dhash(F.col("g")).alias("h")
        ).collect()
    }

    def ref(data: bytes) -> int:
        h = hashlib.sha256(data).digest()
        seed = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        g = (np.resize(seed, 192).reshape(8, 8, 3) / 255.0).mean(axis=2)
        bits = 0
        for r in range(8):
            for c in range(7):
                if g[r][c] > g[r][c + 1]:
                    bits |= 1 << (r * 7 + c)
        return bits

    assert out[0] == ref(b"same bytes") == out[1]
    assert out[2] == ref(b"other") != out[0]
    assert all(0 <= v < (1 << 56) for v in out.values())
