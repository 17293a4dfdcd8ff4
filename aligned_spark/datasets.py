"""Dataset registry (reference ``aligned/schemas/folder.py:48-185``:
``DatasetMetadata`` / ``TrainDatasetMetadata`` / ``DatasetStore``).

A JSON-file-backed catalog of materialized datasets — notably
train/test(/validate) splits, so experiments can re-load the exact
frames that trained a model. Spark-first: the split frames are written
as parquet through the engine's sources; the registry stores only
metadata (paths, fractions, counts, schema)."""

from __future__ import annotations

import datetime as dt
import json
import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DatasetMetadata:
    """``SingleDatasetMetadata`` (``folder.py:57``)."""

    id: str
    path: str
    format: str = "parquet"
    name: str | None = None
    description: str | None = None
    created_at: str = ""
    row_count: int | None = None
    schema: dict[str, str] = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)


@dataclass
class TrainDatasetMetadata:
    """``TrainDatasetMetadata`` (``folder.py:84``)."""

    id: str
    train: DatasetMetadata
    test: DatasetMetadata
    validate: DatasetMetadata | None = None
    target_column: str | None = None
    test_fraction: float | None = None
    validate_fraction: float | None = None


class DatasetStore:
    """JSON-file registry (``DatasetStore``, ``folder.py:152``)."""

    def __init__(self, path: str):
        self.path = path

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {"datasets": [], "train_test": []}

    def _save(self, data: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=2)
        os.replace(tmp, self.path)

    def store_dataset(self, meta: DatasetMetadata) -> None:
        data = self._load()
        data["datasets"] = [
            d for d in data["datasets"] if d["id"] != meta.id
        ] + [asdict(meta)]
        self._save(data)

    def list_datasets(self) -> list[DatasetMetadata]:
        return [DatasetMetadata(**d) for d in self._load()["datasets"]]

    def dataset(self, dataset_id: str) -> DatasetMetadata | None:
        for d in self._load()["datasets"]:
            if d["id"] == dataset_id:
                return DatasetMetadata(**d)
        return None

    def load(self, spark: SparkSession, dataset_id: str) -> DataFrame:
        meta = self.dataset(dataset_id)
        if meta is None:
            raise KeyError(f"unknown dataset {dataset_id!r}")
        from aligned_spark.sources.file import read_parquet

        if meta.format == "parquet":
            return read_parquet(spark, meta.path)
        return spark.read.format(meta.format).load(meta.path)

    # -- train/test materialization -------------------------------------
    def store_train_test(
        self,
        dataset_id: str,
        base_dir: str,
        df: DataFrame,
        test_fraction: float,
        validate_fraction: float | None = None,
        target: str | None = None,
        event_timestamp: str | None = None,
        seed: int = 42,
    ) -> TrainDatasetMetadata:
        """Split, write each part as parquet, register the metadata —
        ``store_train_test(_validate)`` (``folder.py:182-186``)."""
        from aligned_spark.operators.splits import (
            train_test_split,
            train_test_validate_split,
        )

        if validate_fraction is not None:
            train, test, validate = train_test_validate_split(
                df, test_fraction, validate_fraction, target, event_timestamp, seed
            )
            parts = [("train", train), ("test", test), ("validate", validate)]
        else:
            train, test = train_test_split(
                df, test_fraction, target, event_timestamp, seed
            )
            parts = [("train", train), ("test", test)]

        metas: dict[str, DatasetMetadata] = {}
        now = dt.datetime.now(dt.timezone.utc).isoformat()
        for part_name, frame in parts:
            path = os.path.join(base_dir, dataset_id, part_name)
            frame.write.mode("overwrite").parquet(path)
            metas[part_name] = DatasetMetadata(
                id=f"{dataset_id}/{part_name}",
                path=path,
                created_at=now,
                row_count=frame.count(),
                schema=dict(frame.dtypes),
            )
            self.store_dataset(metas[part_name])

        train_meta = TrainDatasetMetadata(
            id=dataset_id,
            train=metas["train"],
            test=metas["test"],
            validate=metas.get("validate"),
            target_column=target,
            test_fraction=test_fraction,
            validate_fraction=validate_fraction,
        )
        data = self._load()
        data["train_test"] = [
            t for t in data["train_test"] if t["id"] != dataset_id
        ] + [asdict(train_meta)]
        self._save(data)
        return train_meta
