"""Exposed-model layer tests (reference ``exposed_model/`` surface)."""

from __future__ import annotations

import pytest

from aligned_spark.models import (
    CodePredictor,
    MLFlowModel,
    PartitionedModel,
    ShadowModel,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, seg string, x double",
    )


def test_code_predictor(frame):
    m = CodePredictor(lambda pdf: pdf["x"] * 10)
    out = m.predict(frame, ["x"])
    assert {r.id: r.prediction for r in out.collect()} == {
        1: 10.0,
        2: 20.0,
        3: 30.0,
    }


def test_partitioned_model(frame):
    m = PartitionedModel(
        partition_col="seg",
        models={
            "a": CodePredictor(lambda pdf: pdf["x"] + 100),
            "b": CodePredictor(lambda pdf: pdf["x"] + 200),
        },
        default=CodePredictor(lambda pdf: pdf["x"] * 0),
    )
    out = m.predict(frame, ["x"])
    assert {r.id: r.prediction for r in out.collect()} == {
        1: 101.0,
        2: 202.0,
        3: 0.0,
    }


def test_shadow_model(frame):
    m = ShadowModel(
        primary=CodePredictor(lambda pdf: pdf["x"]),
        shadow=CodePredictor(lambda pdf: pdf["x"] * -1),
    )
    out = m.predict(frame, ["x"])
    rows = {r.id: (r.prediction, r.shadow_prediction) for r in out.collect()}
    assert rows == {1: (1.0, -1.0), 2: (2.0, -2.0), 3: (3.0, -3.0)}


def test_mlflow_model_clear_error(frame):
    m = MLFlowModel("models:/missing/1")
    try:
        import mlflow  # noqa: F401

        pytest.skip("mlflow installed; error path not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="mlflow"):
        m.predict(frame, ["x"]).collect()


def test_sparkml_model_quality_classifier(spark):
    """A fitted pyspark.ml LogisticRegression served through
    SparkMLModel: trained on text-quality features, scored fully
    JVM-side (no Python workers in the inference plan)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from aligned_spark.models import SparkMLModel

    # weak labels: long docs with low punct ratio are "good"
    train = spark.createDataFrame(
        [(float(n), float(p), 1.0 if n > 50 and p < 0.2 else 0.0)
         for n in (10, 30, 60, 90, 120) for p in (0.05, 0.15, 0.4)],
        "n_tokens double, punct_ratio double, label double",
    )
    assembled = VectorAssembler(
        inputCols=["n_tokens", "punct_ratio"], outputCol="__features"
    ).transform(train)
    lr = LogisticRegression(
        featuresCol="__features", labelCol="label"
    ).fit(assembled)

    m = SparkMLModel(model=lr)
    score = spark.createDataFrame(
        [(1, 100.0, 0.1), (2, 15.0, 0.5)],
        "doc_id long, n_tokens double, punct_ratio double",
    )
    out = m.predict(score, ["n_tokens", "punct_ratio"], output_col="good")
    rows = {r.doc_id: r.good for r in out.collect()}
    assert rows == {1: 1.0, 2: 0.0}
    # vector/intermediate columns are cleaned up
    assert set(out.columns) == {"doc_id", "n_tokens", "punct_ratio", "good"}
    # inference plan is JVM-only
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "EvalPython" not in plan


def test_prediction_view_feeds_features_for(spark, tmp_path):
    """Model chaining (reference model-contract output views): model
    A's predictions materialize into its output view, and
    features_for serves them like any other feature view."""
    import datetime as dt

    from aligned_spark.contracts import (
        EventTimestamp,
        Float64,
        Int64,
        feature_view,
        model_contract,
    )
    from pyspark.sql import functions as F

    from aligned_spark.models import CodePredictor
    from aligned_spark.sources.file import FileSource
    from aligned_spark.store import ContractStore

    t0 = dt.datetime(2024, 1, 10)
    base = str(tmp_path / "base")
    spark.createDataFrame(
        [(1, t0, 2.0), (2, t0, 3.0)], "user_id long, ts timestamp, x double"
    ).write.parquet(base)

    @feature_view(name="base", source=FileSource.parquet(base))
    class Base:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        x = Float64()

    @model_contract(
        name="scorer",
        input_features=["base:x"],
        output_source=FileSource.parquet(str(tmp_path / "preds")),
        predictor=CodePredictor(lambda pdf: pdf["x"] * 100),
    )
    class Scorer:
        user_id = Int64().as_entity()
        ts = EventTimestamp()
        scorer_prediction = Float64()

    store = ContractStore(spark)
    store.add_view(Base)
    store.add_model(Scorer)

    ents = spark.createDataFrame(
        [(1, t0), (2, t0)], "user_id long, event_timestamp timestamp"
    )
    preds = store.predict_over("scorer", ents).withColumn(
        "ts", F.col("event_timestamp")
    )
    store.insert_into(
        "scorer_predictions",
        preds.select("user_id", "ts", "scorer_prediction"),
    )

    # downstream consumer reads predictions as ordinary features
    out = store.features_for(
        ents, ["scorer_predictions:scorer_prediction"]
    )
    got = {r.user_id: r.scorer_prediction for r in out.collect()}
    assert got == {1: 200.0, 2: 300.0}


def test_sparkml_probability_of_class(spark):
    """`predict_proba_of` — the reference's TargetProbability
    (`target.probability_of(1)`, feature_factory.py:334-352): the
    classifier's probability for ONE class as its own column,
    complementary across a binary pair, JVM-only plan."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from aligned_spark.models import SparkMLModel

    train = spark.createDataFrame(
        [(float(n), float(p), 1.0 if n > 50 and p < 0.2 else 0.0)
         for n in (10, 30, 60, 90, 120) for p in (0.05, 0.15, 0.4)],
        "n_tokens double, punct_ratio double, label double",
    )
    assembled = VectorAssembler(
        inputCols=["n_tokens", "punct_ratio"], outputCol="__features"
    ).transform(train)
    lr = LogisticRegression(
        featuresCol="__features", labelCol="label"
    ).fit(assembled)
    m = SparkMLModel(model=lr)
    score = spark.createDataFrame(
        [(1, 100.0, 0.1), (2, 15.0, 0.5)],
        "doc_id long, n_tokens double, punct_ratio double",
    )
    p1 = m.predict_proba_of(
        score, ["n_tokens", "punct_ratio"], 1, output_col="p_good"
    )
    p0 = m.predict_proba_of(
        score, ["n_tokens", "punct_ratio"], 0, output_col="p_bad"
    )
    r1 = {r.doc_id: r.p_good for r in p1.collect()}
    r0 = {r.doc_id: r.p_bad for r in p0.collect()}
    assert r1[1] > 0.5 > r1[2]
    for k in (1, 2):
        assert abs(r1[k] + r0[k] - 1.0) < 1e-9
    assert set(p1.columns) == {
        "doc_id", "n_tokens", "punct_ratio", "p_good"
    }
    plan = p1._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert "EvalPython" not in plan
    # non-probabilistic models fail loudly
    from pyspark.ml.regression import LinearRegression

    lin = LinearRegression(
        featuresCol="__features", labelCol="label"
    ).fit(assembled)
    import pytest as _pytest

    with _pytest.raises(TypeError, match="probabilistic"):
        SparkMLModel(model=lin).predict_proba_of(
            score, ["n_tokens", "punct_ratio"], 1
        )


def test_predict_when_missing_serves_fresh_predictions(spark, tmp_path):
    """`predict_when_missing` (reference feature_store.py:335-352 via
    PredictModelSource): the store copy serves a model's OUTPUT VIEW
    by computing predictions from the input view at read time — no
    materialization, never stale — while the original store still
    points at the (empty) materialized source."""
    from aligned_spark.contracts import (
        Float64,
        Int64,
        feature_view,
        model_contract,
    )
    from aligned_spark.models import CodePredictor
    from aligned_spark.sources.file import FileSource
    from aligned_spark.store import ContractStore

    base = str(tmp_path / "base")
    spark.createDataFrame(
        [(1, 2.0), (2, 3.0)], "user_id long, x double"
    ).write.parquet(base)

    @feature_view(name="base", source=FileSource.parquet(base))
    class Base:
        user_id = Int64().as_entity()
        x = Float64()

    @model_contract(
        name="scorer",
        input_features=["base:x"],
        output_source=FileSource.parquet(str(tmp_path / "preds")),
        predictor=CodePredictor(lambda pdf: pdf["x"] * 100),
    )
    class Scorer:
        user_id = Int64().as_entity()
        scorer_prediction = Float64()

    store = ContractStore(spark)
    store.add_view(Base)
    store.add_model(Scorer)

    live = store.predict_when_missing()
    out = live.feature_view("scorer_predictions").all()
    got = {
        r.user_id: r.scorer_prediction
        for r in out.select("user_id", "scorer_prediction").collect()
    }
    assert got == {1: 200.0, 2: 300.0}
    # base mutations surface immediately (read-time compute)
    spark.createDataFrame(
        [(3, 5.0)], "user_id long, x double"
    ).write.mode("append").parquet(base)
    out2 = live.feature_view("scorer_predictions").all()
    assert out2.count() == 3
    # the ORIGINAL store still points at the materialized source
    from aligned_spark.sources.file import FileSource as FS

    assert not isinstance(
        store.views["scorer_predictions"].source, type(live.views["scorer_predictions"].source)
    )


def test_abtest_model_deterministic_weighted_routing(spark):
    """ABTestModel (reference exposed_model/interface.py:566): rows
    route to arms by a deterministic per-row hash honoring the
    weights; the same row always lands in the same arm (replayable —
    unlike the reference's per-batch random draw), the split tracks
    the weights, and arm_column agrees with the served prediction."""
    from aligned_spark.models import ABTestModel, CodePredictor

    m = ABTestModel(
        models=[
            (CodePredictor(lambda pdf: pdf["x"] * 0 + 1.0), 3.0),
            (CodePredictor(lambda pdf: pdf["x"] * 0 + 2.0), 1.0),
        ],
        hash_cols=["uid"],
        seed=5,
    )
    df = spark.range(0, 2000).selectExpr(
        "id AS uid", "CAST(id AS DOUBLE) AS x"
    )
    out = df.withColumn("pred", m.prediction_column(df, ["x"])).withColumn(
        "arm", m.arm_column(df, ["x"])
    )
    rows = out.groupBy("arm", "pred").count().collect()
    by_arm = {int(r.arm): (r.pred, r["count"]) for r in rows}
    assert set(by_arm) == {0, 1}
    assert by_arm[0][0] == 1.0 and by_arm[1][0] == 2.0
    frac0 = by_arm[0][1] / 2000
    assert 0.70 < frac0 < 0.80  # 3:1 weights -> ~75%
    # replayable: a second evaluation routes identically
    again = df.withColumn("arm", m.arm_column(df, ["x"]))
    assert (
        out.select("uid", "arm")
        .exceptAll(again.select("uid", "arm"))
        .isEmpty()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no arms"):
        ABTestModel(models=[]).prediction_column(df, ["x"])
