"""Retrieval requests — the logical-plan IR between the catalog and
the DataFrame compiler.

Reference: ``RetrievalRequest`` (``aligned/request/retrieval_request.py:27-51``)
with ``features_to_include`` column pruning (``:77,132-149``) and
topological derived-feature ordering (``:204-231``).

Catalyst already prunes physical columns into the parquet scan; this
request-level pruning exists so we don't *define* unused derived
columns in the first place (SURVEY §4: the only rewrite worth keeping).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from aligned_spark import expr as E
from aligned_spark.types import EventTimestamp, Feature, FeatureType


@dataclass
class RetrievalRequest:
    location: str
    entities: list[str]
    features: list[Feature]
    derived: dict[str, E.Expr]
    derived_dtypes: dict[str, FeatureType]
    aggregations: list  # list[CompiledAggregation]
    event_timestamp: EventTimestamp | None = None
    features_to_include: set[str] = field(default_factory=set)

    @staticmethod
    def from_view(view) -> "RetrievalRequest":
        return RetrievalRequest(
            location=view.name,
            entities=list(view.entities),
            features=list(view.features),
            derived=dict(view.derived),
            derived_dtypes=dict(view.derived_dtypes),
            aggregations=list(view.aggregations),
            event_timestamp=view.event_timestamp,
        )

    # ------------------------------------------------------------------
    def with_features(self, names: set[str]) -> "RetrievalRequest":
        out = RetrievalRequest(
            location=self.location,
            entities=self.entities,
            features=self.features,
            derived=self.derived,
            derived_dtypes=self.derived_dtypes,
            aggregations=self.aggregations,
            event_timestamp=self.event_timestamp,
            features_to_include=set(names),
        )
        return out

    def needed_derived(self) -> dict[str, E.Expr]:
        """Derived features required for the include-set, transitively."""
        if not self.features_to_include:
            return dict(self.derived)
        needed: dict[str, E.Expr] = {}
        stack = [
            n for n in self.features_to_include if n in self.derived
        ]
        # aggregation sources may reference derived columns too
        for agg in self.needed_aggregations():
            col = agg.spec.column
            if isinstance(col, E.Expr):
                stack.extend(r for r in col.references() if r in self.derived)
        while stack:
            name = stack.pop()
            if name in needed:
                continue
            expr = self.derived[name]
            needed[name] = expr
            stack.extend(
                r for r in expr.references() if r in self.derived and r not in needed
            )
        return needed

    def needed_aggregations(self) -> list:
        if not self.features_to_include:
            return list(self.aggregations)
        return [a for a in self.aggregations if a.name in self.features_to_include]

    def scan_columns(self) -> list[str]:
        """Physical source columns needed: entities + event ts + plain
        features that are either requested or feed requested derived/
        aggregated columns."""
        base = {f.name for f in self.features}
        needed: set[str] = set(self.entities)
        if self.event_timestamp is not None:
            needed.add(self.event_timestamp.name)
        include = self.features_to_include or (
            base | set(self.derived) | {a.name for a in self.aggregations}
        )
        needed |= {n for n in include if n in base}
        for expr in self.needed_derived().values():
            needed |= {r for r in expr.references() if r in base}
        for agg in self.needed_aggregations():
            col = agg.spec.column
            if isinstance(col, E.Expr):
                needed |= {r for r in col.references() if r in base}
            elif isinstance(col, str) and col in base:
                needed.add(col)
        return sorted(needed)

    def schema(self) -> dict[str, FeatureType]:
        """Declared dtypes of the physical (scanned) columns."""
        return {f.name: f.dtype for f in self.features}
