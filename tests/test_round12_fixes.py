"""Round-12 fixes, one test (block) per VERDICT/ADVICE item:

- VERDICT task 1: continuous IVM over ICEBERG bases — snapshot ids
  are random, so the exactly-once cursor is the monotone
  ``sequence-number`` the engine's iceberg metadata now stamps
  (``IcebergLog.sequence_numbers``); both IVM families stream via
  ``maintain_continuously`` on both formats.
- VERDICT task 3: mid-split checkpoint-restart exactly-once pins for
  the ROLLING family (its slices are span recomputes, not additive
  deltas — replay safety is idempotence, pinned here end-to-end).
- ADVICE r12 #1: ``unpack_embeddings`` zero/NULL probed width raises
  instead of silently dropping the column.
- ADVICE r12 #2: rolling reserved-name check covers ``ts_col`` and
  agg-name collisions with base columns.
- ADVICE r12 #3: rolling batch-id guard falls through to the
  idempotent version path after a checkpoint reset (no stall).
- ADVICE r12 #4: rolling ``_apply_slice`` skips its MERGE when a
  concurrent maintainer already advanced past the slice's pin.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 5, 0, minute, 0)


def _rows(spec):
    """spec: list of (k, g, minute, x)."""
    return [
        Row(k=k, g=g, ts=_ts(m), x=float(x)) for k, g, m, x in spec
    ]


_W = 600.0  # 10-minute trailing window


def _aggs():
    from aligned_spark.operators.aggregate import AggSpec

    return [AggSpec("s", "sum", "x"), AggSpec("n", "count", "x")]


def _mk_rolling(src, target):
    from aligned_spark.operators.incremental import (
        RollingIncrementalAggregate,
    )

    return RollingIncrementalAggregate(
        source=src,
        target_path=target,
        row_keys=["k"],
        group_keys=["g"],
        ts_col="ts",
        window_seconds=_W,
        aggs=_aggs(),
    )


def _rolling_direct(spark, src):
    from aligned_spark.operators.aggregate import rolling_aggregate

    return {
        r.k: (r.g, r.ts, r.x, r.s, r.n)
        for r in rolling_aggregate(
            src.read(spark), ["g"], "ts", _W, _aggs()
        ).collect()
    }


def _rolling_maintained(spark, agg):
    return {
        r.k: (r.g, r.ts, r.x, r.s, r.n)
        for r in agg.read(spark).collect()
    }


def _drain(q) -> None:
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def _iceberg_src(tmp_path, name="base"):
    from aligned_spark.sources.iceberg import IcebergSource

    return IcebergSource(path=str(tmp_path / name))


# ======================================================================
# VERDICT task 1 — iceberg sequence numbers + continuous IVM
# ======================================================================


def test_iceberg_sequence_numbers_monotone(spark, tmp_path):
    """Every commit stamps ``sequence-number`` (and metadata
    ``last-sequence-number``); the mapping is 1..N in commit order
    regardless of the random snapshot ids."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    src = _iceberg_src(tmp_path)
    src.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    src.insert(spark.createDataFrame(_rows([(1, "a", 2, 2.0)])))
    src.upsert(
        spark.createDataFrame(_rows([(0, "a", 1, 9.0)])), keys=["k"]
    )
    log = IcebergLog(str(tmp_path / "base"))
    ids = log.snapshot_ids()
    seqs = log.sequence_numbers()
    assert [seqs[s] for s in ids] == [1, 2, 3]
    md = log.current_metadata()
    assert md["last-sequence-number"] == 3
    assert all(
        s.get("sequence-number") == i + 1
        for i, s in enumerate(md["snapshots"])
    )


def test_iceberg_sequence_fallback_position(spark, tmp_path):
    """Snapshots written before the field landed (stripped here to
    simulate) fall back to list position — the same monotone order —
    and a later commit continues the sequence seamlessly."""
    import json
    import os

    from aligned_spark.sources.iceberg_log import IcebergLog

    src = _iceberg_src(tmp_path)
    src.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    src.insert(spark.createDataFrame(_rows([(1, "a", 2, 2.0)])))
    # strip the stamps, pre-r12 style
    meta = os.path.join(str(tmp_path / "base"), "metadata")
    vs = sorted(
        f for f in os.listdir(meta) if f.endswith(".metadata.json")
    )
    p = os.path.join(meta, vs[-1])
    md = json.load(open(p))
    md.pop("last-sequence-number", None)
    for s in md["snapshots"]:
        s.pop("sequence-number", None)
    json.dump(md, open(p, "w"))
    log = IcebergLog(str(tmp_path / "base"))
    ids = log.snapshot_ids()
    assert [log.sequence_numbers()[s] for s in ids] == [1, 2]
    src.insert(spark.createDataFrame(_rows([(2, "a", 3, 3.0)])))
    log2 = IcebergLog(str(tmp_path / "base"))
    assert [
        log2.sequence_numbers()[s] for s in log2.snapshot_ids()
    ] == [1, 2, 3]


def _plain_direct(spark, src):
    return {
        r.g: (r.n, r.x)
        for r in src.read(spark)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("x"))
        .collect()
    }


def _plain_maintained(spark, agg):
    return {r.g: (r.n_rows, r.x) for r in agg.read(spark).collect()}


def _mk_plain(src, target, **kw):
    from aligned_spark.operators.incremental import (
        IncrementalAggregate,
    )

    return IncrementalAggregate(
        source=src,
        target_path=target,
        group_keys=["g"],
        sums=["x"],
        **kw,
    )


def test_plain_ivm_maintain_continuously_iceberg_e2e(spark, tmp_path):
    """The r11 'missing #6': continuous plain IVM over an ICEBERG
    base — throttled initial snapshot bootstraps, later micro-batches
    fold mutations (incl. a MIN-touching delete whose recompute pins
    the base read through the seq→snapshot translation), replays
    no-op."""
    src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(
            _rows(
                [
                    (i, "a" if i % 2 else "b", i, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(4)
    )
    agg = _mk_plain(src, str(tmp_path / "agg"), mins=["x"])
    ckpt = str(tmp_path / "ckpt")
    _drain(
        agg.maintain_continuously(spark, ckpt, max_files_per_trigger=1)
    )
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    src.upsert(
        spark.createDataFrame(_rows([(3, "a", 3, 99.0)])), keys=["k"]
    )
    src.delete_where(spark, F.col("k") == 0)  # b's min (0.0) dies
    _drain(agg.maintain_continuously(spark, ckpt))
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    mins = {
        r.g: r.min_x for r in agg.read(spark).collect()
    }
    direct_min = {
        r.g: r.mn
        for r in src.read(spark)
        .groupBy("g")
        .agg(F.min("x").alias("mn"))
        .collect()
    }
    assert mins == direct_min
    before = _plain_maintained(spark, agg)
    _drain(agg.maintain_continuously(spark, ckpt))  # replay: no-op
    assert _plain_maintained(spark, agg) == before


def test_plain_ivm_iceberg_stream_then_poll_refresh(spark, tmp_path):
    """Poll refresh() after streaming picks up from the stream's
    cursor (interchangeable SEQUENCE-domain txns), and a later
    stream drain skips the refresh-covered commit instead of
    double-counting."""
    src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(_rows([(0, "a", 1, 1.0)])).coalesce(1)
    )
    agg = _mk_plain(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")
    _drain(agg.maintain_continuously(spark, ckpt))
    src.insert(spark.createDataFrame(_rows([(1, "b", 2, 5.0)])))
    assert agg.refresh(spark) is not None  # poll covers the insert
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    _drain(agg.maintain_continuously(spark, ckpt))
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)


def test_rolling_maintain_continuously_iceberg_e2e(spark, tmp_path):
    """Iceberg twin of ``test_rolling_maintain_continuously_e2e`` —
    the VERDICT task-1 'done' criterion."""
    src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(
            _rows(
                [
                    (i, "a" if i % 2 else "b", i * 3, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(4)
    )
    agg = _mk_rolling(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        _drain(
            agg.maintain_continuously(
                spark, ckpt, max_files_per_trigger=1
            )
        )

    drain()  # 4-file snapshot drains as several micro-batches
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )
    src.upsert(
        spark.createDataFrame(_rows([(3, "a", 45, 99.0)])), keys=["k"]
    )
    src.delete_where(spark, F.col("k") == 2)
    drain()
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )
    before = _rolling_maintained(spark, agg)
    drain()  # replay: nothing changes
    assert _rolling_maintained(spark, agg) == before


def test_legacy_snapshot_id_cursor_translates(spark, tmp_path):
    """Aggregates persisted before r12 stored the RAW snapshot id as
    their txn cursor; ``_cursor_seq`` recognizes and translates it
    (63-bit ids never collide with small sequence numbers), and an
    id that is neither domain raises instead of misordering."""
    src = _iceberg_src(tmp_path)
    src.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    src.insert(spark.createDataFrame(_rows([(1, "a", 2, 2.0)])))
    agg = _mk_plain(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    assert agg.last_applied() == 2  # sequence domain
    s2q = src.sequence_numbers()
    sid = src.version(spark)
    assert agg._cursor_seq(sid) == s2q[sid]  # legacy translation
    assert agg._cursor_seq(2) == 2  # already a sequence number
    with pytest.raises(ValueError, match="neither"):
        agg._cursor_seq(10_000_019)  # neither domain


# ======================================================================
# VERDICT task 3 — rolling mid-split checkpoint-restart pins
# ======================================================================


def _ivm_run_once(spark, agg, ckpt: str) -> None:
    """ONE trigger-once micro-batch of the continuous-IVM pipeline
    against a shared checkpoint — every call is a FRESH query
    instance, so each batch boundary is also a restart boundary
    (offset resume from the checkpoint, incl. mid-split
    ``{version|snapshot_id, cidx}`` offsets)."""
    src = agg._stream_source(max_files_per_trigger=1)
    q = (
        src.read_stream(spark)
        .writeStream.foreachBatch(
            lambda bdf, bid: agg.apply_changes(
                spark, bdf, batch_id=bid
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(once=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.parametrize("fmt", ["delta", "iceberg"])
def test_rolling_mid_split_checkpoint_restart_exactly_once(
    spark, tmp_path, fmt
):
    """Kill/restart between CONTINUATION slices of a throttled
    initial snapshot (4 files, 1 per trigger, fresh query instance
    per trigger): the maintained rolling view must equal a direct
    batch rolling pass after every restart — the rolling family's
    replay safety is span-recompute idempotence, pinned here."""
    if fmt == "delta":
        from aligned_spark.sources.delta import DeltaSource

        src = DeltaSource(path=str(tmp_path / "base"))
    else:
        src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(
            _rows(
                [
                    (i, "a" if i % 2 else "b", i * 2, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(4)
    )
    agg = _mk_rolling(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")
    for _ in range(6):  # 4 splits + slack; restart at every boundary
        _ivm_run_once(spark, agg, ckpt)
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )
    # a mutation drains through the same restart-per-batch regime
    src.upsert(
        spark.createDataFrame(_rows([(1, "a", 2, 42.0)])), keys=["k"]
    )
    src.delete_where(spark, F.col("k") == 4)
    for _ in range(3):
        _ivm_run_once(spark, agg, ckpt)
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )


def test_plain_ivm_iceberg_mid_split_checkpoint_restart(
    spark, tmp_path
):
    """Iceberg twin of the r11 plain-IVM mid-split restart pin: the
    {snapshot_id, cidx} offset resumes exactly-once through the
    sequence-domain cursor (additive deltas — a double-fold would
    show as doubled sums)."""
    src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(
            _rows(
                [
                    (i, "a" if i % 2 else "b", i, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(4)
    )
    agg = _mk_plain(src, str(tmp_path / "agg"))
    ckpt = str(tmp_path / "ckpt")
    for _ in range(6):
        _ivm_run_once(spark, agg, ckpt)
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    src.insert(spark.createDataFrame(_rows([(8, "a", 9, 8.0)])))
    for _ in range(2):
        _ivm_run_once(spark, agg, ckpt)
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)


# ======================================================================
# ADVICE r12
# ======================================================================


def test_unpack_embeddings_zero_width_raises(spark):
    """#1: a probed width of 0/NULL must raise (data-dependent
    schema), not silently drop the column; an explicit width keeps
    the schema stable on empty input."""
    from aligned_spark.operators.core import unpack_embeddings

    empty = spark.createDataFrame(
        [], "id long, emb array<float>"
    )
    with pytest.raises(ValueError, match="probed width"):
        unpack_embeddings(empty, ["emb"])
    all_null = spark.createDataFrame(
        [Row(id=1, emb=None)], "id long, emb array<float>"
    )
    with pytest.raises(ValueError, match="probed width"):
        unpack_embeddings(all_null, ["emb"])
    with pytest.raises(ValueError, match="positive"):
        unpack_embeddings(all_null, {"emb": 0})
    out = unpack_embeddings(empty, {"emb": 3})
    assert out.columns == ["id", "emb_0", "emb_1", "emb_2"]


def test_rolling_reserved_name_clashes_raise(spark, tmp_path):
    """#2: ts_col named like an agg (or __lo/__hi) fails fast at
    construction; an agg named like a BASE column fails at the first
    refresh instead of silently overwriting it."""
    from aligned_spark.operators.aggregate import AggSpec
    from aligned_spark.operators.incremental import (
        RollingIncrementalAggregate,
    )
    from aligned_spark.sources.delta import DeltaSource

    def mk(aggs, ts_col="ts"):
        return RollingIncrementalAggregate(
            source=DeltaSource(path=str(tmp_path / "base")),
            target_path=str(tmp_path / "agg"),
            row_keys=["k"],
            group_keys=["g"],
            ts_col=ts_col,
            window_seconds=_W,
            aggs=aggs,
        )

    with pytest.raises(ValueError, match="reserved column clash"):
        mk([AggSpec("ts", "sum", "x")])  # agg named like ts_col
    with pytest.raises(ValueError, match="reserved column clash"):
        mk([AggSpec("__lo", "sum", "x")])  # span working column
    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    bad = mk([AggSpec("x", "sum", "x")])  # agg named like base col
    with pytest.raises(ValueError, match="collide with base"):
        bad.refresh(spark)


def test_rolling_checkpoint_reset_does_not_stall(spark, tmp_path):
    """#3: after a checkpoint RESET the stream's batch ids restart
    at 0 below the target's old batch-txn watermark; slices carrying
    NEW versions must still apply (idempotent path) instead of the
    view silently stalling."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _rows([(i, "a", i, float(i)) for i in range(4)])
        ).repartition(4)
    )
    agg = _mk_rolling(src, str(tmp_path / "agg"))
    # several micro-batches push the batch txn watermark up
    _drain(
        agg.maintain_continuously(
            spark, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        )
    )
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )
    src.upsert(
        spark.createDataFrame(_rows([(1, "a", 1, 77.0)])), keys=["k"]
    )
    # FRESH checkpoint: batch ids restart at 0 (< the old watermark)
    _drain(agg.maintain_continuously(spark, str(tmp_path / "ckpt2")))
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    ), "reset-checkpoint slice with a newer version must apply"


def test_rolling_concurrent_maintainer_merge_guard(spark, tmp_path):
    """#4: a slice whose pin is BEHIND the target's cursor at merge
    time (a concurrent maintainer advanced past it) skips its MERGE
    instead of regressing rows."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(_rows([(0, "a", 1, 1.0)])).coalesce(1)
    )
    agg = _mk_rolling(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    src.upsert(
        spark.createDataFrame(_rows([(0, "a", 1, 50.0)])), keys=["k"]
    )
    stale = src.read_changes(spark, 0, 1)  # the v1 slice, pre-update
    agg.refresh(spark)  # cursor advances to v1's successor? no: to 1
    src.upsert(
        spark.createDataFrame(_rows([(0, "a", 1, 99.0)])), keys=["k"]
    )
    agg.refresh(spark)  # cursor now 2, view shows x=99
    # replaying the stale v1 slice pinned at 1 must NOT regress
    agg._apply_slice(spark, stale, pin=1)
    assert _rolling_maintained(spark, agg) == _rolling_direct(
        spark, src
    )


def test_windowed_maintain_continuously_iceberg_e2e(spark, tmp_path):
    """WINDOWED IVM streams over an iceberg base too: the bucketing
    adapter composes with the sequence-domain cursor (bootstrap from
    a throttled snapshot, fold a MIN-touching mutation whose
    recompute pins the bucketized base read through the seq
    translation, replay no-op)."""
    from aligned_spark.operators.incremental import (
        WindowedIncrementalAggregate,
    )

    src = _iceberg_src(tmp_path)
    src.insert(
        spark.createDataFrame(
            _rows(
                [
                    (i, "a" if i % 2 else "b", i * 3, float(i))
                    for i in range(8)
                ]
            )
        ).repartition(2)
    )
    agg = WindowedIncrementalAggregate(
        source=src,
        target_path=str(tmp_path / "agg"),
        group_keys=["g"],
        sums=["x"],
        mins=["x"],
        ts_col="ts",
        window_seconds=600.0,
    )
    ckpt = str(tmp_path / "ckpt")

    def direct():
        from aligned_spark.operators.incremental import (
            bucketize_windows,
        )

        return {
            (r.g, r["__w_start"]): (r.n, r.x, r.mn)
            for r in bucketize_windows(
                src.read(spark), "ts", 600_000_000, 600_000_000
            )
            .groupBy("g", "__w_start")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("x"),
                F.min("x").alias("mn"),
            )
            .collect()
        }

    def maintained():
        return {
            (r.g, r.window_start): (r.n_rows, r.x, r.min_x)
            for r in agg.read(spark).collect()
        }

    def drain():
        _drain(
            agg.maintain_continuously(
                spark, ckpt, max_files_per_trigger=1
            )
        )

    drain()
    assert maintained() == direct()
    src.upsert(
        spark.createDataFrame(_rows([(3, "a", 45, 99.0)])), keys=["k"]
    )
    src.delete_where(spark, F.col("k") == 0)
    drain()
    assert maintained() == direct()
    before = maintained()
    drain()
    assert maintained() == before


def test_plain_ivm_checkpoint_reset_fails_loudly(spark, tmp_path):
    """Additive counterpart of the rolling reset fix: plain IVM
    slices are NOT idempotent, so a reset checkpoint whose slices
    carry unapplied base versions must RAISE (silently dropping them
    was the inherited stall; silently applying would double-count).
    A reset with nothing new no-ops."""
    from aligned_spark.sources.delta import DeltaSource

    src = DeltaSource(path=str(tmp_path / "base"))
    src.insert(
        spark.createDataFrame(
            _rows([(i, "a", i, float(i)) for i in range(4)])
        ).repartition(4)
    )
    agg = _mk_plain(src, str(tmp_path / "agg"))
    _drain(
        agg.maintain_continuously(
            spark, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        )
    )
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    # reset with NO new data: bootstrap redelivery no-ops
    _drain(agg.maintain_continuously(spark, str(tmp_path / "ckpt2")))
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    # reset WITH new data: loud failure instead of stall/double-count
    src.insert(spark.createDataFrame(_rows([(9, "b", 9, 9.0)])))
    q = agg.maintain_continuously(spark, str(tmp_path / "ckpt3"))
    with pytest.raises(Exception, match="checkpoint reset detected"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    # the prescribed recovery: poll refresh, then a fresh stream
    agg.refresh(spark)
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)
    _drain(agg.maintain_continuously(spark, str(tmp_path / "ckpt4")))
    assert _plain_maintained(spark, agg) == _plain_direct(spark, src)


def test_ivm_cursor_under_expired_snapshot_raises(spark, tmp_path):
    """Retention edge: expire_snapshots under an IVM cursor removes
    the slice the refresh would need — the cursor must fail LOUDLY
    ('rebuild the aggregate'), never misorder or silently full-scan.
    Sequence stamps on the SURVIVING snapshots are preserved by
    expiry, so a cursor still covered by retention keeps working."""
    from aligned_spark.sources.iceberg_log import IcebergLog

    src = _iceberg_src(tmp_path)
    src.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    agg = _mk_plain(src, str(tmp_path / "agg"))
    agg.refresh(spark)
    assert agg.last_applied() == 1
    src.insert(spark.createDataFrame(_rows([(1, "a", 2, 2.0)])))
    src.insert(spark.createDataFrame(_rows([(2, "b", 3, 3.0)])))
    log = IcebergLog(str(tmp_path / "base"))
    log.expire_snapshots(keep_last=1, retention_seconds=0)
    # surviving snapshot keeps its stamped sequence number (3)
    assert list(log.sequence_numbers().values()) == [3]
    with pytest.raises(ValueError, match="rebuild the aggregate"):
        agg.refresh(spark)
    # a cursor still inside retention keeps refreshing
    src2 = _iceberg_src(tmp_path, "base2")
    src2.insert(spark.createDataFrame(_rows([(0, "a", 1, 1.0)])))
    agg2 = _mk_plain(src2, str(tmp_path / "agg2"))
    agg2.refresh(spark)
    src2.insert(spark.createDataFrame(_rows([(1, "b", 2, 2.0)])))
    assert agg2.refresh(spark) == 2
    assert _plain_maintained(spark, agg2) == _plain_direct(spark, src2)


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_iceberg_stream_ivm_random_op_soak(spark, tmp_path, seed):
    """Seeded random op sequences (insert/upsert/delete) maintained
    over an ICEBERG base ENTIRELY by the CDF stream: after every
    drain the aggregate equals a direct group-by — the
    sequence-domain cursor survives arbitrary interleavings, not
    just the scripted e2e scenario."""
    import random

    rng = random.Random(seed)
    src = _iceberg_src(tmp_path)
    rows = {
        k: ("a" if k % 2 else "b", float(k)) for k in range(6)
    }
    src.insert(
        spark.createDataFrame(
            _rows([(k, g, k, x) for k, (g, x) in rows.items()])
        ).coalesce(1)
    )
    agg = _mk_plain(src, str(tmp_path / "agg"), mins=["x"])
    ckpt = str(tmp_path / "ckpt")

    def drain():
        _drain(agg.maintain_continuously(spark, ckpt))

    drain()
    next_k = 100
    for _ in range(3):
        op = rng.choice(["insert", "upsert", "delete"])
        if op == "insert":
            k = next_k
            next_k += 1
            g = rng.choice(["a", "b", "c"])
            x = float(rng.randint(-50, 50))
            rows[k] = (g, x)
            src.insert(
                spark.createDataFrame(_rows([(k, g, k % 59, x)]))
            )
        elif op == "upsert" and rows:
            k = rng.choice(sorted(rows))
            g = rng.choice(["a", "b", "c"])
            x = float(rng.randint(-50, 50))
            rows[k] = (g, x)
            src.upsert(
                spark.createDataFrame(_rows([(k, g, k % 59, x)])),
                keys=["k"],
            )
        elif rows:
            k = rng.choice(sorted(rows))
            del rows[k]
            src.delete_where(spark, F.col("k") == k)
        drain()
        assert _plain_maintained(spark, agg) == _plain_direct(
            spark, src
        ), f"diverged after {op} (seed {seed})"
        mins = {r.g: r.min_x for r in agg.read(spark).collect()}
        direct_min = {
            r.g: r.mn
            for r in src.read(spark)
            .groupBy("g")
            .agg(F.min("x").alias("mn"))
            .collect()
        }
        assert mins == direct_min, f"min diverged (seed {seed})"
