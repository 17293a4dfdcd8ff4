"""Contract JSON round-trip (reference: codable schema layer —
contracts persist as JSON in a registry and reconstruct identically,
``aligned/schemas/feature_view.py``)."""

from __future__ import annotations

import json

from aligned_spark.contracts import (
    EventTimestamp,
    Float64,
    Int64,
    String,
    feature_view,
)
from aligned_spark.plans.view_query import compute_view
from aligned_spark.serde import view_from_dict, view_to_dict
from aligned_spark.sources.file import FileSource


def _rich_view(sf_dir="/root/testdata/sf0.001"):
    @feature_view(
        name="ev_serde",
        source=FileSource.parquet(f"{sf_dir}/events.parquet"),
    )
    class Ev:
        user_id = Int64().as_entity()
        ts = EventTimestamp(ttl_seconds=86400.0)
        value = Float64().is_required().lower_bound(-1e9)
        event_type = String()

        doubled = value * 2.0
        flagged = (value > 10.0) & (event_type == "purchase")

        total_7d = value.aggregate().sum().over(days=7)
        n_7d = value.aggregate().count().over(days=7)

    return Ev.compiled


def test_view_json_roundtrip_plans_identically(spark):
    view = _rich_view()
    blob = json.dumps(view_to_dict(view))  # must be pure JSON
    back = view_from_dict(json.loads(blob))

    assert back.name == view.name
    assert back.entities == view.entities
    assert [f.name for f in back.features] == [
        f.name for f in view.features
    ]
    assert back.event_timestamp == view.event_timestamp
    assert set(back.derived) == set(view.derived)
    # Expr IR equality via its own dict form
    for k in view.derived:
        assert back.derived[k].to_dict() == view.derived[k].to_dict()
    assert {c for c in back.constraints} == {c for c in view.constraints}

    a = sorted(map(tuple, compute_view(view, spark).collect()))
    b = sorted(map(tuple, compute_view(back, spark).collect()))
    assert a == b and len(a) > 0


def test_live_source_refuses_serialization(spark):
    import pytest

    from aligned_spark.serde import view_to_dict
    from aligned_spark.sources.in_memory import InMemorySource

    @feature_view(
        name="mem_serde",
        source=InMemorySource.from_dict(
            {"user_id": [1]}, schema="user_id long"
        ),
    )
    class Mem:
        user_id = Int64().as_entity()

    with pytest.raises(ValueError, match="no JSON form"):
        view_to_dict(Mem.compiled)


def test_store_registry_roundtrip(spark):
    from aligned_spark.store import ContractStore

    store = ContractStore(spark)
    store.add_compiled_view(_rich_view())
    blob = store.to_json()
    store2 = ContractStore.from_json(blob, spark)
    assert set(store2.views) == set(store.views)
    # a PIT retrieval through the RECONSTRUCTED store works
    import datetime as dt

    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 20))], "user_id long, event_timestamp timestamp"
    )
    out = store2.features_for(
        facts, ["ev_serde:doubled", "ev_serde:total_7d"]
    )
    assert out.count() == 1


def test_source_deserialization_rejects_unknown_callable():
    """The source registry is an allowlist (mirrors the reference's
    BatchDataSourceFactory.supported_data_sources): a catalog naming
    an arbitrary module/class — the classic subprocess.Popen gadget —
    is rejected, never imported or instantiated."""
    import pytest

    from aligned_spark.serde import _source_from_dict

    for payload in (
        {"module": "subprocess", "cls": "Popen",
         "fields": {"args": ["true"]}},
        {"module": "os", "cls": "system", "fields": {}},
        {"module": "aligned_spark.serde", "cls": "view_from_dict",
         "fields": {}},
    ):
        with pytest.raises(ValueError, match="unknown source type"):
            _source_from_dict(payload)

    # a genuine registered source still round-trips
    from aligned_spark.serde import _source_to_dict
    from aligned_spark.sources.file import FileSource

    src = FileSource.parquet("/tmp/x.parquet")
    assert _source_from_dict(_source_to_dict(src)) == src
