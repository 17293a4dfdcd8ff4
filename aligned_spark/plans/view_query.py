"""Single-view query execution (entry point B of the reference:
``View.query().all()`` / ``.between_dates()``, SURVEY.md §3.2).

Pipeline (reference ``FileFullJob`` ``aligned/local/job.py:218-292``
then ``ensure_types().derive_features()``):

    scan(needed cols) → fill missing optional → cast to contract
    dtypes → staged derived withColumns → windowed/plain aggregations

Everything stays one Catalyst plan: scans read only
``request.scan_columns()`` (column pruning at the source), filters
applied through ``.filter()`` push into the scan, and derived rounds
collapse into projections.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aligned_spark.contracts import CompiledFeatureView, FeatureViewWrapper
from aligned_spark.operators import core as ops
from aligned_spark.operators.aggregate import (
    group_aggregate,
    hopping_aggregate,
    rolling_aggregate,
)
from aligned_spark.requests import RetrievalRequest


def _session(spark: SparkSession | None) -> SparkSession:
    if spark is not None:
        return spark
    active = SparkSession.getActiveSession()
    if active is None:
        from aligned_spark.session import get_spark

        return get_spark()
    return active


def compute_view(
    view: CompiledFeatureView,
    spark: SparkSession,
    features: set[str] | None = None,
    limit: int | None = None,
    between: tuple[dt.datetime, dt.datetime] | None = None,
    skip_aggregations: bool = False,
    store: "Any" = None,
) -> DataFrame:
    """Scan the view's source and compute requested features.

    ``store``: a ContractStore, required only when the view declares
    cross-contract ``LoadFeatureRef`` features (they join other
    views)."""
    request = RetrievalRequest.from_view(view)
    if features:
        request = request.with_features(features)

    source = view.materialized_source or view.source
    df = None
    if view.materialized_source is not None:
        # materialization reuse (`feature_view.py:806`): if every
        # requested column already exists there, serve it directly.
        # A missing/not-yet-written materialization falls back to the
        # base source (also how `store.materialize` computes the frame
        # it is about to write).
        try:
            df = source.read(spark)
        except Exception:
            df = None
            source = view.source
    if view.materialized_source is not None and df is not None:
        wanted = request.features_to_include or set(view.all_feature_names())
        if wanted <= set(df.columns):
            # entities may already be inside `wanted` — dedupe
            keep = list(dict.fromkeys(list(request.entities) + sorted(wanted)))
            out = df.select(*keep)
            if between is not None:
                if view.event_timestamp is None:
                    raise ValueError(f"view {view.name!r} has no event timestamp")
                start, end = between
                ts = view.event_timestamp.name
                out = out.filter(
                    (F.col(ts) >= F.lit(start)) & (F.col(ts) <= F.lit(end))
                )
            return out.limit(limit) if limit else out
        source = view.source

    df = source.read(spark)

    # skip-already-computed: aggregated/derived columns present in the
    # scanned schema are trusted as materialized (`local/job.py:249-252`)
    present = set(df.columns)
    agg_present = all(a.name in present for a in request.needed_aggregations())

    scan_cols = request.scan_columns()
    if agg_present and request.aggregations:
        scan_cols = sorted(set(scan_cols) | {a.name for a in request.aggregations})
    df = ops.select_columns(df, [c for c in scan_cols if c in present])
    df = ops.fill_missing_columns(df, view.defaults)
    df = ops.ensure_types(df, request.schema())

    if between is not None:
        if view.event_timestamp is None:
            raise ValueError(f"view {view.name!r} has no event timestamp")
        start, end = between
        ts = view.event_timestamp.name
        df = df.filter((F.col(ts) >= F.lit(start)) & (F.col(ts) <= F.lit(end)))

    derived = request.needed_derived()
    if derived:
        from aligned_spark.expr import LoadFeatureRef

        cross = {
            n: e for n, e in derived.items() if isinstance(e, LoadFeatureRef)
        }
        local = {n: e for n, e in derived.items() if n not in cross}
        if local:
            df = ops.derive(df, local)
        if cross:
            if store is None:
                raise ValueError(
                    f"view {view.name!r} has cross-contract features "
                    f"{sorted(cross)} — query it through a ContractStore"
                )
            for n, e in cross.items():
                df = store.load_feature(
                    df, e.view, e.feature, e.entity_mapping, output_col=n
                )

    aggregations = request.needed_aggregations()
    if aggregations and not agg_present and not skip_aggregations:
        df = _apply_aggregations(df, view, aggregations)

    if request.features_to_include:
        keep = list(
            dict.fromkeys(
                request.entities
                + ([view.event_timestamp.name] if view.event_timestamp else [])
                + [
                    n
                    for n in request.features_to_include
                    if n in df.columns
                ]
            )
        )
        df = df.select(*[c for c in keep if c in df.columns])

    if limit is not None:
        df = df.limit(limit)
    return df


def _apply_aggregations(df: DataFrame, view: CompiledFeatureView, aggregations) -> DataFrame:
    """Three regimes (SURVEY §2.5): plain group-by, rolling window,
    hopping window. Multiple distinct rolling windows all ride the
    same shuffle (same partition keys), so they cost one exchange."""
    keys = view.entities
    ts = view.event_timestamp.name if view.event_timestamp else None

    plain = [a for a in aggregations if a.window.window_seconds is None]
    rolling = [
        a
        for a in aggregations
        if a.window.window_seconds is not None and a.window.every_seconds is None
    ]
    hopping = [
        a
        for a in aggregations
        if a.window.window_seconds is not None and a.window.every_seconds is not None
    ]

    if plain and (rolling or hopping):
        raise ValueError("mixing windowed and plain aggregations in one view")

    if plain:
        return group_aggregate(df, keys, [a.spec for a in plain])

    out = df
    if rolling:
        if ts is None:
            raise ValueError("rolling aggregation requires an event timestamp")
        # group by distinct window length; all share one shuffle
        by_window: dict[float, list] = {}
        for a in rolling:
            by_window.setdefault(a.window.window_seconds, []).append(a)
        for window_seconds, group in by_window.items():
            out = rolling_aggregate(
                out, keys, ts, window_seconds, [a.spec for a in group]
            )
    if hopping:
        if ts is None:
            raise ValueError("hopping aggregation requires an event timestamp")
        if rolling:
            raise ValueError(
                "mixing rolling and hopping aggregations in one view is "
                "not supported; split into two views"
            )
        # group specs by identical window geometry: each group is ONE
        # groupBy over the base frame; distinct geometries are joined
        # back on (keys, stamp) — sequential application would feed an
        # already-grouped frame into the next groupBy
        groups: dict[tuple[float, float, float], list] = {}
        for a in hopping:
            key = (
                a.window.window_seconds,
                a.window.every_seconds,
                a.window.offset_seconds or 0.0,
            )
            groups.setdefault(key, []).append(a)
        result: DataFrame | None = None
        for (period, every, offset), group in groups.items():
            g = hopping_aggregate(
                out,
                keys,
                ts,
                every_seconds=every,
                period_seconds=period,
                aggs=[a.spec for a in group],
                offset_seconds=offset,
            )
            result = (
                g
                if result is None
                else result.join(g, on=keys + [ts], how="full_outer")
            )
        out = result
    return out


class FeatureViewQuery:
    """``view.query()`` handle (reference ``FeatureViewStore``)."""

    def __init__(
        self,
        view: CompiledFeatureView,
        spark: SparkSession | None = None,
        store: Any = None,
    ):
        self.view = view
        self.spark = _session(spark)
        self.store = store
        self._features: set[str] | None = None
        self._filter: Any = None

    def select(self, features: set[str] | list[str]) -> "FeatureViewQuery":
        self._features = set(features)
        return self

    def filter(self, predicate: Any) -> "FeatureViewQuery":
        self._filter = predicate
        return self

    def all(self, limit: int | None = None) -> DataFrame:
        df = compute_view(
            self.view, self.spark, self._features, limit=None, store=self.store
        )
        if self._filter is not None:
            df = ops.filter_rows(df, self._filter)
        return df.limit(limit) if limit else df

    def between_dates(self, start: dt.datetime, end: dt.datetime) -> DataFrame:
        df = compute_view(
            self.view,
            self.spark,
            self._features,
            between=(start, end),
            store=self.store,
        )
        if self._filter is not None:
            df = ops.filter_rows(df, self._filter)
        return df

    def unique_entities(self) -> DataFrame:
        """Latest row per entity (``retrieval_job.py:1148-1166``)."""
        if self.view.event_timestamp is None:
            return self.all().dropDuplicates(self.view.entities)
        return ops.unique_rows(
            self.all(), self.view.entities, self.view.event_timestamp.name
        )

    def features_for(self, entities: Any) -> DataFrame:
        """PIT features for an entity/fact frame — single-view fast path."""
        from aligned_spark.store import ContractStore

        store = ContractStore(self.spark)
        store.add_compiled_view(self.view)
        names = [f"{self.view.name}:{n}" for n in self.view.all_feature_names()]
        return store.features_for(entities, names)


def joined_views(
    left: FeatureViewWrapper,
    right: FeatureViewWrapper,
    on: str | list[str],
    how: str = "inner",
):
    """``FeatureViewWrapper.join`` (reference ``feature_view.py:293``)."""
    from aligned_spark.operators.joins import equi_join

    keys = [on] if isinstance(on, str) else list(on)

    def read(spark: SparkSession) -> DataFrame:
        l = compute_view(left.compiled, spark)
        r = compute_view(right.compiled, spark)
        return equi_join(l, r, keys, how=how)

    from aligned_spark.sources.combinators import CustomMethodSource

    return CustomMethodSource(read)


def stacked_views(
    top: FeatureViewWrapper,
    bottom: FeatureViewWrapper,
    source_column: str | None = None,
):
    """``FeatureViewWrapper.vstack`` (reference ``feature_view.py:210``)."""

    def read(spark: SparkSession) -> DataFrame:
        dfs = [compute_view(top.compiled, spark), compute_view(bottom.compiled, spark)]
        return ops.stack(dfs, source_column, [top.name, bottom.name])

    from aligned_spark.sources.combinators import CustomMethodSource

    return CustomMethodSource(read)
