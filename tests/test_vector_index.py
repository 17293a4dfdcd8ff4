"""Vector index source tests: update (write-time bucketing),
nearest_n exact vs LSH recall, HttpCsvSource with injected transport,
ApiModel batch plumbing."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from aligned_spark.models import ApiModel
from aligned_spark.sources.http import HttpCsvSource
from aligned_spark.sources.vector_index import VectorIndexSource


def _unit(deg: float) -> list[float]:
    import math

    return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]


def test_ivf_index_source_roundtrip(spark, tmp_path):
    import random

    from aligned_spark.operators.similarity import top_k_similar
    from aligned_spark.sources.vector_index import IvfIndexSource

    rng = random.Random(5)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    ivf = IvfIndexSource(
        path=str(tmp_path / "ivf"), id_col="vec_id",
        vector_col="embedding", num_centroids=4, seed=3,
    )
    ivf.overwrite(emb)
    assert len(ivf.centroids(spark)) == 4
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in top_k_similar(q, emb, "vec_id", "embedding", k=3).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf.nearest_n(q, n=3, nprobe=4).collect()
    }
    assert full == exact
    pruned = ivf.nearest_n(q, n=3, nprobe=2)
    assert pruned.count() == 15  # 5 queries × k — probing still fills k


def test_vector_index_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="aligned_vix_")
    vix = VectorIndexSource(
        path=f"{tmp}/index", id_col="vid", vector_col="vec", dim=2,
        num_planes=4, num_tables=2,
    )
    base = spark.createDataFrame(
        [(i, _unit(i * 10.0)) for i in range(18)],
        "vid long, vec array<double>",
    )
    vix.overwrite(base)

    # update path: upsert a changed row + a new row
    vix.update(
        spark.createDataFrame(
            [(0, _unit(5.0)), (99, _unit(7.0))], "vid long, vec array<double>"
        )
    )
    stored = vix.read(spark)
    assert stored.count() == 19
    assert {c for c in stored.columns if c.startswith("__bucket_")} == {
        "__bucket_0",
        "__bucket_1",
    }

    queries = spark.createDataFrame(
        [(1000, _unit(6.0))], "vid long, vec array<double>"
    )
    exact = vix.nearest_n(queries, n=3, exact=True)
    rows = exact.orderBy(F.desc("sim"), "neighbor_id").collect()
    # 5° and 7° are both 1° away from the 6° query (cosine tie →
    # neighbor_id ascending), then vid=1 at 10°
    assert [r.neighbor_id for r in rows] == [0, 99, 1]

    # LSH path: candidates pruned by bucket; nearest angle must survive
    approx = vix.nearest_n(queries, n=3, exact=False)
    got = {r.neighbor_id for r in approx.collect()}
    assert 99 in got


def test_http_csv_injected_transport(spark):
    src = HttpCsvSource(
        url="https://example.invalid/data.csv",
        fetch=lambda url: b"a,b\n1,x\n2,y\n",
    )
    df = src.read(spark)
    assert {tuple(r) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_api_model_batched(spark):
    calls: list[int] = []

    def client(prompts):
        calls.append(len(prompts))
        return [p.upper() for p in prompts]

    df = spark.createDataFrame(
        [("hello",), ("world",)], "prompt string"
    ).coalesce(1)
    m = ApiModel(client=client)
    out = m.predict(df, ["prompt"], output_col="completion")
    got = {r.prompt: r.completion for r in out.collect()}
    assert got == {"hello": "HELLO", "world": "WORLD"}

    # offline default: deterministic fake, no network
    fake = ApiModel().predict(df, ["prompt"], output_col="completion")
    assert {r.completion for r in fake.collect()} == {
        "echo:hello",
        "echo:world",
    }


def test_ivf_probe_recall_curve(spark):
    """Honest accuracy measurement for the approximate path on the
    real embeddings table (near-uniform vectors — the IVF worst
    case): recall must (a) be exact at nprobe == num_centroids,
    (b) grow monotonically with nprobe, and (c) beat the
    uniform-probing baseline nprobe/num_centroids at every setting —
    i.e. the quantizer routes queries to the RIGHT clusters, it is
    not a random partition. Guards probe routing and centroid
    assignment against silent regressions."""
    from aligned_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        top_k_similar,
    )
    from aligned_spark.sources.file import read_parquet

    emb = read_parquet(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < 20)

    exact = top_k_similar(qs, emb, "vec_id", "embedding", k=5)
    truth: dict = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    assigned, centers = ivf_assign(emb, "embedding", num_centroids=16, seed=42)

    def recall(nprobe: int) -> float:
        out = ivf_topk(
            qs, emb, "vec_id", "embedding", k=5, num_centroids=16,
            nprobe=nprobe, assigned=assigned, centers=centers,
        )
        got: dict = {}
        for r in out.collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(
            len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
        ) / len(truth)

    r4, r8, r16 = recall(4), recall(8), recall(16)
    assert r16 == 1.0, f"full probe must be exact, got {r16:.3f}"
    assert r4 <= r8 <= r16, f"non-monotone recall {r4:.2f}/{r8:.2f}/{r16:.2f}"
    assert r4 > 4 / 16 and r8 > 8 / 16, (
        f"recall no better than random probing: {r4:.2f}@4, {r8:.2f}@8"
    )


def test_lsh_pair_verify_bit_parity(spark):
    """The Arrow pair-cosine verify must be BIT-identical to the
    codegen fold: same per-dim accumulation order, so the whole pair
    set and every sim value match exactly on awkward float32 data."""
    import random

    from aligned_spark.operators.similarity import lsh_bucketed_pairs

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=16, threshold=0.2, num_planes=3, num_tables=2)
    a = {
        (r.vec_id_a, r.vec_id_b): r.sim
        for r in lsh_bucketed_pairs(
            df, "vec_id", "embedding", impl="arrow", **kw
        ).collect()
    }
    b = {
        (r.vec_id_a, r.vec_id_b): r.sim
        for r in lsh_bucketed_pairs(
            df, "vec_id", "embedding", impl="codegen", **kw
        ).collect()
    }
    assert a.keys() == b.keys() and len(a) > 50
    assert all(a[k] == b[k] for k in a), "sim values diverged bitwise"
