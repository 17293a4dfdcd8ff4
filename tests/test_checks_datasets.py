"""Contract checks, lineage, and dataset registry tests."""

from __future__ import annotations

import tempfile

from aligned_spark.checks import (
    check_all,
    check_model_features,
    check_view_schema,
    lineage,
)
from aligned_spark.contracts import (
    Float64,
    Int64,
    String,
    feature_view,
    load_feature,
    model_contract,
)
from aligned_spark.datasets import DatasetStore
from aligned_spark.sources.in_memory import InMemorySource
from aligned_spark.store import ContractStore


def _store(spark):
    src = InMemorySource.from_dict(
        {"uid": [1, 2], "x": [1.0, 2.0], "label": ["a", "b"]},
        schema="uid long, x double, label string",
    )

    @feature_view(name="base", source=src)
    class Base:
        uid = Int64().as_entity()
        x = Float64()
        label = String()

    @feature_view(name="downstream", source=src)
    class Downstream:
        uid = Int64().as_entity()
        x = Float64()
        borrowed = load_feature("base:x", {"uid": "uid"})

    @model_contract(name="m_ok", input_features=["base:x"])
    class MOk:
        pass

    @model_contract(name="m_bad", input_features=["base:nope", "ghost:x"])
    class MBad:
        pass

    store = ContractStore(spark)
    store.add_view(Base)
    store.add_view(Downstream)
    store.add_model(MOk)
    store.add_model(MBad)
    return store


def test_model_feature_checks(spark):
    store = _store(spark)
    assert check_model_features(store, "m_ok").is_ok
    bad = check_model_features(store, "m_bad")
    assert not bad.is_ok
    assert set(bad.missing_features) == {"base:nope", "ghost:x"}
    assert "missing features" in bad.as_markdown()


def test_view_schema_check(spark):
    store = _store(spark)
    assert check_view_schema(store, "base").is_ok

    # a contract declaring a column the source lacks → drift
    src = InMemorySource.from_dict({"uid": [1]}, schema="uid long")

    @feature_view(name="drifty", source=src)
    class Drifty:
        uid = Int64().as_entity()
        absent = Float64()

    store.add_view(Drifty)
    drift = check_view_schema(store, "drifty")
    assert drift.missing_columns == ["absent"]
    report = check_all(store)
    assert "drifty" in report and "m_bad" in report


def test_lineage(spark):
    store = _store(spark)
    deps = lineage(store)
    assert "view:base" in deps["model:m_ok"]
    assert "view:base" in deps["view:downstream"]  # via LoadFeatureRef


def test_dataset_registry(spark):
    tmp = tempfile.mkdtemp(prefix="aligned_ds_")
    registry = DatasetStore(f"{tmp}/registry.json")
    from pyspark.sql import functions as F

    df = spark.range(1000).withColumn("y", F.lit(1.0))
    meta = registry.store_train_test(
        "exp1", tmp, df, test_fraction=0.2, seed=3
    )
    assert meta.train.row_count + meta.test.row_count == 1000
    assert abs(meta.test.row_count - 200) < 40

    listed = {m.id for m in registry.list_datasets()}
    assert listed == {"exp1/train", "exp1/test"}

    back = registry.load(spark, "exp1/train")
    assert back.count() == meta.train.row_count

    # idempotent re-register
    meta2 = registry.store_train_test("exp1", tmp, df, test_fraction=0.2, seed=3)
    assert meta2.train.row_count == meta.train.row_count
    assert len(registry.list_datasets()) == 2


# --------------------------- registry ergonomics (r7, reference parity)


def test_store_registry_ergonomics(spark, tmp_path):
    from aligned_spark.contracts import Int64, feature_view, model_contract
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    a_src = ParquetSource(path=str(tmp_path / "a.parquet"))
    b_src = ParquetSource(path=str(tmp_path / "b.parquet"))
    spark.createDataFrame([(1,)], "user_id long").write.parquet(a_src.path)
    spark.createDataFrame([(2,)], "user_id long").write.parquet(b_src.path)

    @feature_view(name="va", source=a_src)
    class Va:
        user_id = Int64().as_entity()

    @feature_view(name="vb", source=b_src)
    class Vb:
        user_id = Int64().as_entity()

    s1 = ContractStore(spark)
    s1.add_view(Va)
    s2 = ContractStore(spark)
    s2.add_view(Vb)
    both = s1.combined_with(s2)
    assert set(both.views) == {"va", "vb"}

    assert both.source_for("va") is a_src
    assert both.source_for("missing") is None
    assert {n for n, _ in both.sources_of_type(ParquetSource)} == {
        "va",
        "vb",
    }

    both.update_source_for("va", b_src)
    assert both.source_for("va") is b_src
    assert both.feature_view("va").all().collect()[0][0] == 2

    both.remove("va")
    assert "va" not in both.views
    import pytest

    with pytest.raises(KeyError):
        both.remove("va")


def test_model_feature_store_accessor(spark, tmp_path):
    from aligned_spark.contracts import (
        Float64,
        Int64,
        feature_view,
        model_contract,
    )
    from aligned_spark.sources.file import ParquetSource
    from aligned_spark.store import ContractStore

    src = ParquetSource(path=str(tmp_path / "f.parquet"))
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "user_id long, x double"
    ).write.parquet(src.path)

    @feature_view(name="feats", source=src)
    class Feats:
        user_id = Int64().as_entity()
        x = Float64()

    @model_contract(
        name="doubler",
        input_features=["feats:x"],
        predictor=lambda pdf: pdf["x"] * 2,
    )
    class Doubler:
        user_id = Int64().as_entity()

    store = ContractStore(spark)
    store.add_view(Feats)
    store.add_model(Doubler)
    ms = store.model("doubler")
    assert ms.input_features() == ["feats:x"]
    feats = ms.features_for({"user_id": [1, 2]})
    assert {r["x"] for r in feats.collect()} == {2.0, 3.0}
    preds = ms.predict_over({"user_id": [1]})
    assert preds.collect()[0]["doubler_prediction"] == 4.0


def test_event_trigger_publishes_matching_rows(spark, tmp_path):
    """EventTrigger (reference event_trigger.py:21): rows of a write
    matching the condition publish entity+payload columns to the
    event sink; non-matching writes publish nothing."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from aligned_spark.checks import EventTrigger
    from aligned_spark.contracts import Float64, Int64, feature_view
    from aligned_spark.sources.file import FileSource
    from aligned_spark.sources.in_memory import InMemorySource
    from aligned_spark.store import ContractStore

    @feature_view(
        name="readings",
        source=FileSource.parquet(str(tmp_path / "readings")),
    )
    class Readings:
        sensor_id = Int64().as_entity()
        value = Float64()

    store = ContractStore(spark)
    store.add_view(Readings)
    # empty in-memory sink: start from an empty frame
    sink = InMemorySource(
        spark.createDataFrame([], "sensor_id long, value double")
    )
    trig = EventTrigger(
        condition=F.col("value") > 100.0,
        sink=sink,
        payload=["sensor_id", "value"],
    )
    store.insert_into(
        "readings",
        spark.createDataFrame(
            [Row(sensor_id=1, value=50.0), Row(sensor_id=2, value=150.0)]
        ),
        triggers=[trig],
    )
    got = {(r.sensor_id, r.value) for r in sink.read(spark).collect()}
    assert got == {(2, 150.0)}
    # a batch with no matches publishes nothing
    n = trig.check(
        spark.createDataFrame([Row(sensor_id=3, value=10.0)])
    )
    assert n == 0
    assert sink.read(spark).count() == 1
