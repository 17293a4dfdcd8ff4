"""store.vector_index(...).nearest_n_to(...) — reference
VectorIndexStore parity over the PQ index."""

from pyspark.sql import Row


def test_vector_index_store_roundtrip(spark, tmp_path):
    from aligned_spark.contracts import (
        Embedding,
        Int64,
        feature_view,
        model_contract,
    )
    from aligned_spark.sources.file import read_parquet
    from aligned_spark.sources.vector_index import PqIndexSource
    from aligned_spark.store import ContractStore

    emb = read_parquet(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    idx = PqIndexSource(
        path=str(tmp_path / "pq"),
        id_col="vec_id",
        vector_col="embedding",
        m=8,
        k=16,
        sample=400,
        seed=7,
    )
    idx.overwrite(emb)

    @model_contract(name="embedder", output_source=idx)
    class Embedder:
        vec_id = Int64().as_entity()
        embedding = Embedding(64).indexed()

    store = ContractStore(spark)
    store.add_model(Embedder)
    vix = store.vector_index("embedder")
    got = vix.nearest_n_to(emb.limit(4), n=5, refine=4)
    rows = got.collect()
    assert len(rows) == 20
    assert {r["rank"] for r in rows} == {1, 2, 3, 4, 5}
    # self-match: each query finds itself first (exact refine)
    firsts = {r["query_id"]: r["id"] for r in rows if r["rank"] == 1}
    assert all(q == i for q, i in firsts.items())


def test_vector_index_store_rejects_non_index(spark, tmp_path):
    import pytest

    from aligned_spark.contracts import (
        Embedding,
        Int64,
        model_contract,
    )
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    src = ParquetSource(path=str(tmp_path / "p.parquet"))

    @model_contract(name="plain", output_source=src)
    class Plain:
        vec_id = Int64().as_entity()
        embedding = Embedding(8)

    store = ContractStore(spark)
    store.add_model(Plain)
    with pytest.raises(ValueError, match="not a vector index"):
        store.vector_index("plain")


def test_langchain_retriever_gated(spark, tmp_path):
    """No langchain in this container: the adapter must raise a
    clear ImportError pointing at nearest_n_to."""
    import pytest

    from aligned_spark.contracts import Embedding, Int64, model_contract
    from aligned_spark.sources.vector_index import PqIndexSource
    from aligned_spark.store import ContractStore

    idx = PqIndexSource(path=str(tmp_path / "pq"), id_col="vec_id")

    @model_contract(name="emb2", output_source=idx)
    class Emb2:
        vec_id = Int64().as_entity()
        embedding = Embedding(8)

    store = ContractStore(spark)
    store.add_model(Emb2)
    vix = store.vector_index("emb2")
    try:
        import langchain_core  # noqa: F401

        pytest.skip("langchain present — gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="nearest_n_to"):
        vix.as_langchain_retriver()
