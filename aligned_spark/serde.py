"""Contract (de)serialization — the JSON catalog format.

The reference persists every compiled contract as JSON and ships it
between repos/processes (``aligned/schemas/feature_view.py`` via its
codable schema layer); teams check the registry into git and diff it
in CI. This module gives :class:`CompiledFeatureView` the same
round-trip: ``view_to_dict`` → ``json.dumps`` → ``view_from_dict``
reconstructs a view whose queries plan and return identically.

What serializes: features, derived Exprs (the IR's own
``to_dict``/``from_dict``), aggregations, event timestamp + TTL,
constraints (kind + dataclass fields), defaults, tags, and any
DATACLASS source whose fields are JSON values (file, partitioned,
csv, jdbc, catalog, …). What doesn't: in-memory/custom-method
sources holding live objects, and Column-valued aggregation specs —
both raise with a clear message rather than pickling silently.
"""

from __future__ import annotations

import dataclasses
import importlib
from typing import Any

from aligned_spark import expr as E
from aligned_spark.constraints import Constraint
from aligned_spark.contracts import (
    AggregateWindow,
    CompiledAggregation,
    CompiledFeatureView,
)
from aligned_spark.operators.aggregate import AggSpec
from aligned_spark.types import EventTimestamp, Feature, FeatureType

_JSON_SCALARS = (str, int, float, bool, type(None))


def _constraint_registry() -> dict[str, type]:
    def walk(cls):
        for sub in cls.__subclasses__():
            yield sub
            yield from walk(sub)

    return {c.kind: c for c in walk(Constraint)}


def _source_to_dict(src: Any) -> dict[str, Any] | None:
    if src is None:
        return None
    if not dataclasses.is_dataclass(src):
        raise ValueError(
            f"source {type(src).__name__} holds live objects and has no "
            "JSON form — materialize it to a file/catalog source first"
        )
    fields = dataclasses.asdict(src)
    # Injectable factories (e.g. S3/Azure client_factory, HTTP
    # transport) are runtime WIRING, not contract state: omit them
    # when still at their declared default — deserialization
    # reconstructs the default — and refuse to serialize a
    # custom-injected one (it has no JSON form).
    for f in dataclasses.fields(src):
        v = fields.get(f.name)
        if callable(v) and not isinstance(v, type):
            if v is f.default:
                fields.pop(f.name, None)
            else:
                raise ValueError(
                    f"source field {f.name!r} of "
                    f"{type(src).__name__} holds an injected "
                    f"callable and cannot be serialized"
                )
    for k, v in fields.items():
        if not isinstance(v, (*_JSON_SCALARS, list, dict, tuple)):
            raise ValueError(
                f"source field {k!r} of {type(src).__name__} is not a "
                f"JSON value: {type(v).__name__}"
            )
    return {
        "module": type(src).__module__,
        "cls": type(src).__qualname__,
        "fields": fields,
    }


# Deserialization allowlist: only dataclasses defined in these modules can
# be instantiated from a JSON catalog. Mirrors the reference's factory
# registry (``aligned/schemas/feature_view.py`` —
# ``BatchDataSourceFactory.supported_data_sources`` keyed by type name)
# rather than dynamic import, so a catalog shipped between repos/processes
# can never name an arbitrary callable (e.g. ``subprocess.Popen``).
_SOURCE_MODULES = (
    "aligned_spark.sources.file",
    "aligned_spark.sources.catalog",
    "aligned_spark.sources.combinators",
    "aligned_spark.sources.delta",
    "aligned_spark.sources.iceberg",
    "aligned_spark.sources.jdbc",
    "aligned_spark.sources.s3",
    "aligned_spark.sources.azure_blob",
    "aligned_spark.sources.http",
    "aligned_spark.sources.random_source",
    "aligned_spark.sources.vector_index",
    "aligned_spark.sources.dedup_index",
)


def _source_registry() -> dict[tuple[str, str], type]:
    reg: dict[tuple[str, str], type] = {}
    for mod_name in _SOURCE_MODULES:
        mod = importlib.import_module(mod_name)
        for obj in vars(mod).values():
            if (
                isinstance(obj, type)
                and dataclasses.is_dataclass(obj)
                and obj.__module__ == mod_name
            ):
                reg[(mod_name, obj.__qualname__)] = obj
    return reg


def _source_from_dict(data: dict[str, Any] | None) -> Any:
    if data is None:
        return None
    cls = _source_registry().get((data["module"], data["cls"]))
    if cls is None:
        raise ValueError(
            f"unknown source type {data['module']}.{data['cls']} — "
            "only registered aligned_spark source dataclasses can be "
            "deserialized from a catalog"
        )
    return cls(**data["fields"])


def _spec_column_to_dict(column: Any) -> Any:
    if column is None or isinstance(column, str):
        return column
    if isinstance(column, E.Expr):
        return {"__expr__": column.to_dict()}
    raise ValueError(
        "aggregation specs built from raw Spark Columns have no JSON "
        "form — declare the input as a column name or an Expr"
    )


def _spec_column_from_dict(data: Any) -> Any:
    if isinstance(data, dict) and "__expr__" in data:
        return E.expr_from_dict(data["__expr__"])
    return data


def view_to_dict(view: CompiledFeatureView) -> dict[str, Any]:
    return {
        "name": view.name,
        "description": view.description,
        "entities": list(view.entities),
        "features": [
            {
                "name": f.name,
                "dtype": f.dtype.name,
                "description": f.description,
                "tags": list(f.tags),
            }
            for f in view.features
        ],
        "derived": {k: v.to_dict() for k, v in view.derived.items()},
        "derived_dtypes": {
            k: t.name for k, t in view.derived_dtypes.items()
        },
        "aggregations": [
            {
                "name": a.name,
                "dtype": a.dtype.name,
                "spec": {
                    "name": a.spec.name,
                    "kind": a.spec.kind,
                    "column": _spec_column_to_dict(a.spec.column),
                    "percentile": a.spec.percentile,
                    "separator": a.spec.separator,
                    "approx": a.spec.approx,
                    "rsd": a.spec.rsd,
                    "accuracy": a.spec.accuracy,
                },
                "window": dataclasses.asdict(a.window),
            }
            for a in view.aggregations
        ],
        "event_timestamp": (
            None
            if view.event_timestamp is None
            else {
                "name": view.event_timestamp.name,
                "ttl_seconds": view.event_timestamp.ttl_seconds,
                "dtype": view.event_timestamp.dtype.name,
            }
        ),
        "constraints": {
            col: [
                {"kind": c.kind, **dataclasses.asdict(c)}
                for c in cs
            ]
            for col, cs in view.constraints.items()
        },
        "defaults": {
            k: {"value": v, "dtype": t.name}
            for k, (v, t) in view.defaults.items()
        },
        "tags": {k: list(v) for k, v in view.tags.items()},
        "source": _source_to_dict(view.source),
        "materialized_source": _source_to_dict(view.materialized_source),
    }


def view_from_dict(data: dict[str, Any]) -> CompiledFeatureView:
    registry = _constraint_registry()
    return CompiledFeatureView(
        name=data["name"],
        description=data.get("description"),
        source=_source_from_dict(data.get("source")),
        materialized_source=_source_from_dict(
            data.get("materialized_source")
        ),
        entities=list(data["entities"]),
        features=[
            Feature(
                name=f["name"],
                dtype=FeatureType(f["dtype"]),
                description=f.get("description"),
                tags=tuple(f.get("tags", ())),
            )
            for f in data["features"]
        ],
        derived={
            k: E.expr_from_dict(v) for k, v in data["derived"].items()
        },
        derived_dtypes={
            k: FeatureType(t) for k, t in data["derived_dtypes"].items()
        },
        aggregations=[
            CompiledAggregation(
                name=a["name"],
                dtype=FeatureType(a["dtype"]),
                spec=AggSpec(
                    name=a["spec"]["name"],
                    kind=a["spec"]["kind"],
                    column=_spec_column_from_dict(a["spec"]["column"]),
                    percentile=a["spec"]["percentile"],
                    separator=a["spec"]["separator"],
                    approx=a["spec"].get("approx", False),
                    rsd=a["spec"].get("rsd"),
                    accuracy=a["spec"].get("accuracy"),
                ),
                window=AggregateWindow(**a["window"]),
            )
            for a in data["aggregations"]
        ],
        event_timestamp=(
            None
            if data.get("event_timestamp") is None
            else EventTimestamp(
                name=data["event_timestamp"]["name"],
                ttl_seconds=data["event_timestamp"]["ttl_seconds"],
                dtype=FeatureType(data["event_timestamp"]["dtype"]),
            )
        ),
        constraints={
            col: [
                registry[c["kind"]](
                    **{k: v for k, v in c.items() if k != "kind"}
                )
                for c in cs
            ]
            for col, cs in data["constraints"].items()
        },
        defaults={
            k: (d["value"], FeatureType(d["dtype"]))
            for k, d in data["defaults"].items()
        },
        tags={k: list(v) for k, v in data.get("tags", {}).items()},
    )
