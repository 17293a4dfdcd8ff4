"""Property: for ANY sequence of append/upsert/delete operations,
a merge-on-read table and a copy-on-write table end in the SAME
logical state, and the CDC feed replayed from version 0 reconstructs
that state exactly — the algebraic contract both write postures and
the change feeds must share."""

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "upsert", "delete"]),
        st.lists(
            st.integers(min_value=0, max_value=30),
            min_size=1,
            max_size=5,
            unique=True,
        ),
    ),
    min_size=1,
    max_size=5,
)


def _apply(spark, log, mor: bool, script):
    """Replay the op script; returns the model dict (k -> v)."""
    state: dict[int, str] = {}
    log.write(
        spark.createDataFrame(
            [Row(k=i, v=f"init{i}") for i in range(10)]
        ).coalesce(1),
        "append",
    )
    state.update({i: f"init{i}" for i in range(10)})
    for step, (op, keys) in enumerate(script):
        tag = f"s{step}"
        if op == "append":
            fresh = [k for k in keys if k not in state]
            if not fresh:
                continue
            log.write(
                spark.createDataFrame(
                    [Row(k=k, v=f"{tag}a{k}") for k in fresh]
                ),
                "append",
            )
            state.update({k: f"{tag}a{k}" for k in fresh})
        elif op == "upsert":
            df = spark.createDataFrame(
                [Row(k=k, v=f"{tag}u{k}") for k in keys]
            )
            if mor:
                log.merge_upsert_mor(df, ["k"])
            else:
                log.merge_upsert(df, ["k"])
            state.update({k: f"{tag}u{k}" for k in keys})
        else:
            pred = F.col("k").isin([int(k) for k in keys])
            if mor:
                log.delete_where_mor(spark, pred)
            else:
                log.delete_where(spark, pred)
            for k in keys:
                state.pop(k, None)
    return state


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(script=ops)
def test_mor_equals_cow_and_cdc_reconstructs(spark, tmp_dir, script):
    from aligned_spark.sources.delta_log import DeltaLog

    base = f"{tmp_dir}/{uuid.uuid4().hex}"
    cow = DeltaLog(f"{base}/cow")
    mor = DeltaLog(f"{base}/mor")
    expect = _apply(spark, cow, False, script)
    expect2 = _apply(spark, mor, True, script)
    assert expect == expect2  # the model itself is posture-free

    got_cow = {r.k: r.v for r in cow.read(spark).collect()}
    got_mor = {r.k: r.v for r in mor.read(spark).collect()}
    assert got_cow == expect
    assert got_mor == expect

    # CDC replay: state(v0) + sum of changes == final state
    for log in (cow, mor):
        state = {
            r.k: r.v for r in log.read(spark, version=0).collect()
        }
        changes = log.read_cdf(spark, 0).collect()
        by_version: dict[int, list] = {}
        for r in changes:
            by_version.setdefault(r["_commit_version"], []).append(r)
        for v in sorted(by_version):
            for r in by_version[v]:
                if r["_change_type"] in ("insert", "update_postimage"):
                    state[r.k] = r.v
                elif r["_change_type"] == "delete":
                    state.pop(r.k, None)
        assert state == expect, "CDC replay diverged from the table"


@pytest.fixture(scope="module")
def tmp_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("morprop"))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(script=ops)
def test_iceberg_mor_equals_cow_and_cdc_reconstructs(
    spark, tmp_dir, script
):
    """The Iceberg twin of the Delta property: arbitrary op
    sequences converge to the same logical state under MOR and CoW,
    and read_changes replayed from the first snapshot reconstructs
    it."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    base = f"{tmp_dir}/{uuid.uuid4().hex}"
    cow = IcebergLog(f"{base}/cow")
    mor = IcebergLog(f"{base}/mor")

    def apply_ice(log, is_mor):
        state: dict[int, str] = {}
        log.write(
            spark.createDataFrame(
                [Row(k=i, v=f"init{i}") for i in range(10)]
            ).coalesce(1),
            "append",
        )
        state.update({i: f"init{i}" for i in range(10)})
        for step, (op, keys) in enumerate(script):
            tag = f"s{step}"
            if op == "append":
                fresh = [k for k in keys if k not in state]
                if not fresh:
                    continue
                log.write(
                    spark.createDataFrame(
                        [Row(k=k, v=f"{tag}a{k}") for k in fresh]
                    ),
                    "append",
                )
                state.update({k: f"{tag}a{k}" for k in fresh})
            elif op == "upsert":
                df = spark.createDataFrame(
                    [Row(k=k, v=f"{tag}u{k}") for k in keys]
                )
                if is_mor:
                    log.merge_upsert_mor(df, ["k"])
                else:
                    log.merge_upsert(df, ["k"])
                state.update({k: f"{tag}u{k}" for k in keys})
            else:
                pred = F.col("k").isin([int(k) for k in keys])
                if is_mor:
                    log.delete_where_mor(spark, pred)
                else:
                    log.delete_where(spark, pred)
                for k in keys:
                    state.pop(k, None)
        return state

    expect = apply_ice(cow, False)
    assert apply_ice(mor, True) == expect
    for log in (cow, mor):
        got = {r.k: r.v for r in log.read(spark).collect()}
        assert got == expect
        # CDC replay from the first snapshot
        ids = log.snapshot_ids()
        state = {
            r.k: r.v
            for r in log.read(spark, snapshot_id=ids[0]).collect()
        }
        pos = {s: i for i, s in enumerate(ids)}
        changes = sorted(
            log.read_changes(spark, ids[0]).collect(),
            key=lambda r: pos.get(r["_snapshot_id"], 1 << 60),
        )
        for r in changes:
            if r["_change_type"] in ("insert", "update_postimage"):
                state[r.k] = r.v
            elif r["_change_type"] == "delete":
                state.pop(r.k, None)
        assert state == expect, "CDC replay diverged from the table"
