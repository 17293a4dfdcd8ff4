"""Exposed-model layer: batch inference over Spark DataFrames.

Reference: ``ExposedModel`` (``aligned/exposed_model/interface.py:134-148``)
with mlflow (``exposed_model/mlflow.py``), partitioned routing
(``exposed_model/partitioned.py``) and shadow deployments
(``interface.py:148``). Spark-first: every predictor runs as an
Arrow-batched pandas UDF (or ``mlflow.pyfunc.spark_udf``), so
inference is data-parallel across executors with no driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExposedModel:
    """A model that can predict over a DataFrame's feature columns."""

    def prediction_column(
        self, df: DataFrame, feature_cols: list[str]
    ) -> Column:
        raise NotImplementedError

    def predict(
        self,
        df: DataFrame,
        feature_cols: list[str],
        output_col: str = "prediction",
    ) -> DataFrame:
        return df.withColumn(
            output_col, self.prediction_column(df, feature_cols)
        )


@dataclass
class CodePredictor(ExposedModel):
    """In-process python predictor (``DillPredictor:251`` /
    ``CodePredictor:298``): ``fn(pandas.DataFrame) -> Series``,
    executed as an Arrow-batched pandas UDF."""

    fn: Callable
    output_dtype: str = "double"

    def prediction_column(self, df, feature_cols):
        import pandas as pd

        fn = self.fn
        cols = list(feature_cols)

        # no type hints: Spark's hint-based pandas_udf inference
        # rejects *args signatures; the legacy (fn, returnType) form
        # handles varargs fine
        def _predict(*series):
            pdf = pd.concat(series, axis=1)
            pdf.columns = cols
            return pd.Series(fn(pdf))

        udf = F.pandas_udf(_predict, self.output_dtype)
        return udf(*[F.col(c) for c in cols])


@dataclass
class PickledPredictor(ExposedModel):
    """Serialized-callable predictor — the reference's
    ``DillPredictor`` (exposed_model/interface.py:251-297) and
    ``DillFunction`` (:623): a model registry stores the predictor
    as BYTES so contracts round-trip through serialization without
    importing the training code. Deserialized lazily on the driver
    (once), then served exactly like :class:`CodePredictor` — Spark
    ships the loaded callable to executors with its own closure
    serializer. Uses ``dill`` when importable (serializes BY VALUE —
    full lambda/closure fidelity, the reference's format), stdlib
    ``pickle`` otherwise (serializes module-level functions BY
    REFERENCE, so the defining module must also be importable on
    the executors — builtins, installed-package functions and
    ``functools.partial`` of them always are)."""

    payload: bytes
    output_dtype: str = "double"

    @staticmethod
    def from_callable(fn: Callable) -> "PickledPredictor":
        try:
            import dill  # optional — not in every container

            return PickledPredictor(dill.dumps(fn))
        except ImportError:
            import pickle

            return PickledPredictor(pickle.dumps(fn))

    def _load(self) -> Callable:
        try:
            import dill

            return dill.loads(self.payload)
        except ImportError:
            import pickle

            return pickle.loads(self.payload)

    def prediction_column(self, df, feature_cols):
        return CodePredictor(
            self._load(), output_dtype=self.output_dtype
        ).prediction_column(df, feature_cols)


@dataclass
class MLFlowModel(ExposedModel):
    """``mlflow.pyfunc.spark_udf`` wrapper (``exposed_model/mlflow.py``).

    mlflow is not installed in this container; construction is cheap
    and the import error surfaces only on use, with a clear message."""

    model_uri: str
    output_dtype: str = "double"

    def prediction_column(self, df, feature_cols):
        try:
            import mlflow  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "mlflow is not installed; MLFlowModel needs the mlflow "
                "package (pip install mlflow) on driver and executors"
            ) from exc
        from mlflow.pyfunc import spark_udf  # pragma: no cover

        udf = spark_udf(
            df.sparkSession, self.model_uri, result_type=self.output_dtype
        )
        return udf(*[F.col(c) for c in feature_cols])


@dataclass
class SparkMLModel(ExposedModel):
    """A fitted ``pyspark.ml`` Transformer served through the model
    contract — scoring stays ENTIRELY JVM-side (no Python workers in
    the inference path), the natural 100 TB batch-inference shape.

    ``predict`` assembles the contract's feature columns into the
    vector the estimator was fit on and runs ``model.transform``;
    frame-level, so it overrides :meth:`predict` rather than
    :meth:`prediction_column` (MLlib has no column-expression form).
    Reference role: the mlflow pyfunc path (``exposed_model/
    mlflow.py``) with the model registry replaced by Spark's own
    persistable ML pipeline (``model.save``/``load`` work on any
    DFS path)."""

    model: Any  # fitted pyspark.ml Transformer
    features_col: str = "__features"
    prediction_output: str = "prediction"

    def prediction_column(self, df, feature_cols):
        raise TypeError(
            "SparkMLModel scores frame-level (model.transform); "
            "use predict()"
        )

    def predict(self, df, feature_cols, output_col="prediction"):
        from pyspark.ml.feature import VectorAssembler

        model = self.model
        if hasattr(model, "setFeaturesCol"):
            model = model.copy()
            model.setFeaturesCol(self.features_col)
        assembled = VectorAssembler(
            inputCols=list(feature_cols),
            outputCol=self.features_col,
            handleInvalid="keep",
        ).transform(df)
        out = model.transform(assembled)
        drop = {
            self.features_col,
            "rawPrediction",
            "probability",
            self.prediction_output,
        } & set(out.columns)
        out = out.withColumn(output_col, F.col(self.prediction_output))
        return out.drop(*(drop - {output_col}))

    def predict_proba_of(
        self,
        df,
        feature_cols,
        class_value,
        output_col: str = "probability",
    ):
        """Class-probability feature — the reference's
        ``TargetProbability`` (``target.probability_of(1)``,
        ``aligned/compiler/feature_factory.py:334-352``, compiled
        into the model contract as ``ClassTargetProbability``): the
        probability the classifier assigns to ``class_value``, as
        its own column. MLlib classifiers emit a probability VECTOR
        indexed by label (labels are the 0..k-1 doubles the fit
        produced); ``vector_to_array`` + ``element_at`` projects the
        class' entry — a codegen projection over the scored frame,
        no Python."""
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.functions import vector_to_array

        model = self.model
        if hasattr(model, "setFeaturesCol"):
            model = model.copy()
            model.setFeaturesCol(self.features_col)
        assembled = VectorAssembler(
            inputCols=list(feature_cols),
            outputCol=self.features_col,
            handleInvalid="keep",
        ).transform(df)
        out = model.transform(assembled)
        if "probability" not in out.columns:
            raise TypeError(
                "predict_proba_of needs a probabilistic classifier "
                "(no `probability` column in the model output)"
            )
        idx = int(class_value)
        out = out.withColumn(
            output_col,
            F.element_at(vector_to_array("probability"), idx + 1),
        )
        drop = {
            self.features_col,
            "rawPrediction",
            "probability",
            self.prediction_output,
        } & set(out.columns)
        return out.drop(*(drop - {output_col}))


@dataclass
class PartitionedModel(ExposedModel):
    """Route rows to different models by a partition column
    (``exposed_model/partitioned.py``): one ``when/otherwise`` chain
    over the per-model prediction expressions — a single pass, no
    per-model filtering or union, every branch Arrow-batched."""

    partition_col: str
    models: dict = field(default_factory=dict)  # value -> ExposedModel
    default: ExposedModel | None = None

    def prediction_column(self, df, feature_cols):
        expr: Column | None = None
        for value, model in self.models.items():
            pred = model.prediction_column(df, feature_cols)
            cond = F.col(self.partition_col) == F.lit(value)
            expr = (
                F.when(cond, pred)
                if expr is None
                else expr.when(cond, pred)
            )
        if expr is None:
            raise ValueError("PartitionedModel has no models")
        if self.default is not None:
            return expr.otherwise(
                self.default.prediction_column(df, feature_cols)
            )
        return expr


@dataclass
class ShadowModel(ExposedModel):
    """Shadow deployment (``interface.py:148``): the primary model's
    prediction is returned; the shadow's lands in a side column for
    offline comparison."""

    primary: ExposedModel
    shadow: ExposedModel
    shadow_col: str = "shadow_prediction"

    def prediction_column(self, df, feature_cols):
        return self.primary.prediction_column(df, feature_cols)

    def predict(
        self,
        df: DataFrame,
        feature_cols: list[str],
        output_col: str = "prediction",
    ) -> DataFrame:
        out = df.withColumn(
            output_col, self.primary.prediction_column(df, feature_cols)
        )
        return out.withColumn(
            self.shadow_col, self.shadow.prediction_column(out, feature_cols)
        )


@dataclass
class ABTestModel(ExposedModel):
    """Weighted A/B routing between exposed models (reference
    ``ABTestModel``, ``exposed_model/interface.py:566-622``: runs the
    arm a weighted random draw picks).

    The reference draws ONE random number per batch; here routing is
    a deterministic PER-ROW hash of ``hash_cols`` (default: all
    feature columns) mapped to [0, 1) — the property a real A/B needs
    (the same entity always lands in the same arm, and the split is
    replayable offline), and the whole thing stays codegen: a
    ``when/otherwise`` chain over the arms' prediction expressions,
    the :class:`PartitionedModel` pattern with a hash coordinate
    instead of a partition value. Weights need not sum to 1 — they
    normalize."""

    models: list  # [(ExposedModel, weight), ...]
    hash_cols: list | None = None
    seed: int = 0

    def _validated_total(self) -> float:
        """Weight sanity shared by prediction and arm routing: a
        negative weight would make the cumulative when-chain
        boundaries non-monotone — that arm silently gets zero
        traffic and every later arm's mass skews away from its
        declared weight, so reject it as loudly as total<=0."""
        bad = [w for _, w in self.models if float(w) < 0]
        if bad:
            raise ValueError(
                f"ABTestModel weights must be >= 0, got {bad}"
            )
        total = float(sum(w for _, w in self.models))
        if total <= 0:
            raise ValueError("ABTestModel weights must sum > 0")
        return total

    def prediction_column(self, df, feature_cols):
        if not self.models:
            raise ValueError("ABTestModel has no arms")
        total = self._validated_total()
        cols = list(self.hash_cols or feature_cols)
        buckets = 1 << 20
        coord = F.pmod(
            F.xxhash64(*[F.col(c) for c in cols], F.lit(self.seed)),
            F.lit(buckets),
        ).cast("double") / F.lit(float(buckets))
        expr: Column | None = None
        acc = 0.0
        for model, w in self.models[:-1]:
            acc += float(w) / total
            pred = model.prediction_column(df, feature_cols)
            cond = coord < F.lit(acc)
            expr = (
                F.when(cond, pred)
                if expr is None
                else expr.when(cond, pred)
            )
        last = self.models[-1][0].prediction_column(df, feature_cols)
        # the final arm takes the residual mass — no float-boundary
        # row can ever fall through
        return last if expr is None else expr.otherwise(last)

    def arm_column(self, df, feature_cols) -> Column:
        """Which arm (index) each row routes to — materialize it next
        to the prediction for the offline uplift analysis an A/B
        exists for."""
        total = self._validated_total()
        cols = list(self.hash_cols or feature_cols)
        buckets = 1 << 20
        coord = F.pmod(
            F.xxhash64(*[F.col(c) for c in cols], F.lit(self.seed)),
            F.lit(buckets),
        ).cast("double") / F.lit(float(buckets))
        expr: Column | None = None
        acc = 0.0
        for i, (_, w) in enumerate(self.models[:-1]):
            acc += float(w) / total
            cond = coord < F.lit(acc)
            expr = (
                F.when(cond, F.lit(i))
                if expr is None
                else expr.when(cond, F.lit(i))
            )
        last = F.lit(len(self.models) - 1)
        return last if expr is None else expr.otherwise(last)


@dataclass
class MultipleModels(ExposedModel):
    """Run EVERY model over the same inputs and stack the prediction
    frames, one row-block per model tagged with its version (reference
    ``MultipleModels``, ``exposed_model/multiple.py:23-92``: vstacks
    each arm's predictions with the prediction view's
    ``model_version_column`` stamped).

    Spark-first shape: each arm scores the SAME cached input plan and
    the stack is ``unionByName`` — arms score in one job, no
    per-model driver loop over data. Complements the router models:
    :class:`ABTestModel` picks ONE arm per row; this one keeps every
    arm's prediction (champion/challenger backtesting)."""

    models: list  # [(ExposedModel, version_str), ...]
    version_col: str = "model_version"

    def prediction_column(self, df, feature_cols):
        raise TypeError(
            "MultipleModels stacks one frame per arm (frame-level); "
            "use predict()"
        )

    def predict(self, df, feature_cols, output_col="prediction"):
        if not self.models:
            raise ValueError("MultipleModels has no models")
        if self.version_col in df.columns:
            raise ValueError(
                f"input already has a {self.version_col!r} column"
            )
        parts = [
            m.predict(df, feature_cols, output_col=output_col).withColumn(
                self.version_col, F.lit(str(version))
            )
            for m, version in self.models
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


@dataclass
class ApiModel(ExposedModel):
    """API-backed generate/embed predictor (reference ollama/openai
    exposed models, ``exposed_model/ollama.py:29,262``,
    ``exposed_model/openai.py:207,322``).

    The transport is injectable: ``client(prompts: list[str]) ->
    list[...]`` is called once per Arrow batch inside a pandas UDF —
    batched, rate-limitable, executor-parallel; never one HTTP call
    per row. No client configured → a deterministic fake so pipelines
    are testable offline (this container has no network)."""

    prompt_col: str = "prompt"
    client: Callable | None = None
    output_dtype: str = "string"

    def prediction_column(self, df, feature_cols):
        import pandas as pd

        client = self.client

        def _fake(prompts):
            return [f"echo:{p[:32]}" for p in prompts]

        call = client if client is not None else _fake

        def _predict(series):
            return pd.Series(call(series.astype(str).tolist()))

        udf = F.pandas_udf(_predict, self.output_dtype)
        return udf(F.col(feature_cols[0]))


def as_exposed_model(obj: Any) -> ExposedModel:
    """Coerce a bare callable into a CodePredictor."""
    if isinstance(obj, ExposedModel):
        return obj
    if callable(obj):
        return CodePredictor(obj)
    raise TypeError(f"cannot expose {type(obj)} as a model")
