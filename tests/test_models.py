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
