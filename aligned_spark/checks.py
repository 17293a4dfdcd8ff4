"""Contract checks + lineage (reference ``aligned/checks.py:12-216``,
``depends_on`` ``batch_data_source.py:316-317``).

Pure catalog/metadata inspection — no Spark jobs except the schema
probe, which reads only parquet footers / JDBC metadata."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from aligned_spark.store import ContractStore


@dataclass
class ModelNeededFeaturesCheck:
    """``ModelHaveNeededFeaturesCheck`` (``checks.py:12-35``)."""

    model_name: str
    missing_features: list[str] = field(default_factory=list)

    @property
    def is_ok(self) -> bool:
        return not self.missing_features

    def as_markdown(self) -> str:
        if self.is_ok:
            return f"Model `{self.model_name}` has all needed features."
        lines = "\n- ".join(f"`{f}`" for f in self.missing_features)
        return f"Model `{self.model_name}` is missing features:\n- {lines}"


@dataclass
class ViewSchemaCheck:
    """Contract vs physical-source schema drift."""

    view_name: str
    missing_columns: list[str] = field(default_factory=list)
    type_mismatches: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def is_ok(self) -> bool:
        return not self.missing_columns and not self.type_mismatches

    def as_markdown(self) -> str:
        if self.is_ok:
            return f"View `{self.view_name}` matches its source schema."
        out = [f"View `{self.view_name}` has schema drift:"]
        for c in self.missing_columns:
            out.append(f"- missing column `{c}`")
        for c, want, got in self.type_mismatches:
            out.append(f"- `{c}`: contract `{want}` vs source `{got}`")
        return "\n".join(out)


def check_model_features(store: "ContractStore", model_name: str) -> ModelNeededFeaturesCheck:
    """Every input reference of the model resolves to a feature on a
    registered view (``feature_exist``, ``checks.py:38-51``)."""
    model = store.models[model_name]
    missing: list[str] = []
    for ref in model.input_references:
        view = store.views.get(ref.location.name)
        if view is None or ref.name not in set(view.all_feature_names()):
            missing.append(ref.identifier())
    return ModelNeededFeaturesCheck(model_name, missing)


def check_view_schema(store: "ContractStore", view_name: str) -> ViewSchemaCheck:
    """Declared (non-derived) columns exist in the physical source
    with compatible types."""
    view = store.views[view_name]
    try:
        actual = dict(view.source.read(store.spark).dtypes)
    except Exception:
        return ViewSchemaCheck(view_name)  # unreadable source: unchecked
    missing: list[str] = []
    mismatches: list[tuple[str, str, str]] = []
    for feat in view.features:
        if feat.name not in actual:
            missing.append(feat.name)
            continue
        want = feat.dtype.spark_type.simpleString()
        got = actual[feat.name]
        # castable numeric/temporal drift is tolerated, same as
        # EnsureTypes coerces at read time; flag only hard conflicts
        numerics = {"tinyint", "smallint", "int", "bigint", "float", "double"}
        if want != got and not (want in numerics and got in numerics):
            mismatches.append((feat.name, want, got))
    return ViewSchemaCheck(view_name, missing, mismatches)


def check_all(store: "ContractStore") -> str:
    """Markdown report over every registered model and view."""
    sections = []
    for name in store.models:
        sections.append(check_model_features(store, name).as_markdown())
    for name in store.views:
        sections.append(check_view_schema(store, name).as_markdown())
    return "\n\n".join(sections)


def lineage(store: "ContractStore") -> dict[str, set[str]]:
    """view/model → upstream locations it depends on: the physical
    source group, cross-contract ``LoadFeatureRef`` targets, and model
    input views (``depends_on`` ``batch_data_source.py:316-317``)."""
    from aligned_spark.expr import LoadFeatureRef

    out: dict[str, set[str]] = {}
    for name, view in store.views.items():
        deps: set[str] = set()
        if view.source is not None:
            deps.add(f"source:{view.source.job_group_key()}")
        for e in view.derived.values():
            for node in _walk(e):
                if isinstance(node, LoadFeatureRef):
                    deps.add(f"view:{node.view}")
        out[f"view:{name}"] = deps
    for name, model in store.models.items():
        out[f"model:{name}"] = {
            f"view:{r.location.name}" for r in model.input_references
        }
    return out


def _walk(e):
    yield e
    for v in e.__dict__.values():
        from aligned_spark.expr import Expr

        if isinstance(v, Expr):
            yield from _walk(v)
        elif isinstance(v, (list, tuple)):
            for item in v:
                if isinstance(item, Expr):
                    yield from _walk(item)
                elif (
                    isinstance(item, tuple)
                    and len(item) == 2
                    and isinstance(item[1], Expr)
                ):
                    yield from _walk(item[1])


@dataclass
class EventTrigger:
    """Write-side event publication (reference ``EventTrigger``,
    ``aligned/schemas/event_trigger.py:21-80``; resolved per view by
    ``ContractStore.event_triggers_for``, ``feature_store.py:806``):
    rows of a write batch matching ``condition`` publish their
    (entity + payload) columns to an event sink.

    ``condition`` is a Spark ``Column`` predicate (or the engine's
    expression IR — anything with ``to_spark()``); ``sink`` is any
    source exposing ``insert(df)`` (the in-memory source in tests, a
    Kafka/file sink in production). One filter + one write per
    checked batch — the filter rides the batch's plan, no extra scan
    of the base."""

    condition: "object"
    sink: "object"
    payload: list[str] | None = None

    def check(self, df) -> int:
        """Publish matching rows; returns how many were sent (0 =
        nothing matched, no write issued)."""
        from aligned_spark import expr as _E

        cond = self.condition
        # NOT hasattr(): a Spark Column fabricates any attribute
        # access as a field accessor, so only the engine IR converts
        if isinstance(cond, _E.Expr):
            cond = cond.to_spark()
        events = df.filter(cond)
        if self.payload:
            events = events.select(*self.payload)
        # count first, publish only when non-empty: two driver
        # actions over the (tiny) filtered match set — the empty
        # case must not touch the sink at all (a no-match write
        # would still create files on file-backed sinks)
        n = events.count()
        if n:
            self.sink.insert(events)
        return n
