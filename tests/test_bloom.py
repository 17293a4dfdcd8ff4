"""Bloom-filter sidecar data skipping (`sources/bloom.py` +
DeltaLog integration) — the pruning min/max footer stats cannot do on
uniformly-distributed keys (every part's range covers every key).

Covers: sidecar build on write/OPTIMIZE, read-path equality pruning
(present key → its file; absent key → zero files, zero rows), MERGE
discovery pruning with a single-file source at tight fpp, soundness
of every pruned read, type-mismatch and over-cap fallbacks, bloom
refs surviving checkpoints, and vacuum reaping orphaned sidecars.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aligned_spark.sources.delta_log import DeltaLog, _file_may_match


def _uniform(spark, lo, hi, n_files=8):
    # xxhash64 ids: every file's (min, max) range spans ~the full
    # int64 line, so range skipping can never prune
    return (
        spark.range(lo, hi)
        .select(F.xxhash64("id").alias("k"), F.col("id").alias("v"))
        .repartition(n_files)
    )


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    tbl = str(tmp_path_factory.mktemp("bloom") / "t")
    log = DeltaLog(tbl)
    log.write(_uniform(spark, 0, 40_000))
    # tight fpp: the MERGE discovery probes each file with the whole
    # source key set, so false survival compounds per key
    log.set_bloom_filter(["k"], fpp=1e-6)
    # explicit rows-per-file target: compaction re-stages -> indexes
    # old parts, pinned to a MULTI-file layout (size-targeted staging
    # would otherwise rightly collapse 40k rows into one file, and
    # one file proves nothing about pruning)
    log.optimize(spark, target_rows_per_file=5_000)
    return log


def test_sidecars_built_and_read_prunes(spark, bloom_table):
    log = bloom_table
    snap = log.snapshot()
    assert len(snap.files) >= 2
    assert all(
        (a.get("bloomFilters") or {}).get("k") for a in snap.files.values()
    )

    key = log.read(spark).select("k").first()["k"]
    preds = [("k", "=", key)]
    range_surv = [
        p for p in sorted(snap.files)
        if _file_may_match(snap.files[p], preds)
    ]
    assert len(range_surv) == len(snap.files)  # ranges can't prune
    bloom_surv = log._bloom_prune(spark, snap, range_surv, preds)
    assert len(bloom_surv) == 1
    # and the pruned read still finds the row (soundness)
    assert (
        log.read(spark, skipping=preds).filter(F.col("k") == key).count()
        == 1
    )


def test_absent_key_prunes_everything(spark, bloom_table):
    log = bloom_table
    snap = log.snapshot()
    preds = [("k", "=", 123_456_789)]  # not an xxhash64 of 0..40k
    surv = log._bloom_prune(spark, snap, sorted(snap.files), preds)
    assert surv == []
    assert (
        log.read(spark, skipping=preds)
        .filter(F.col("k") == 123_456_789)
        .count()
        == 0
    )


def test_merge_discovery_prunes_to_source_file(spark, bloom_table):
    log = bloom_table
    snap = log.snapshot()
    one = sorted(snap.files)[0]
    src = (
        spark.read.parquet(os.path.join(log.table_path, one))
        .select("k")
        .limit(300)
        .withColumn("v", F.lit(-1).cast("long"))
    )
    cands = log._key_range_candidates(snap, src, ["k"])
    assert one in cands  # sound: the true file always survives
    assert len(cands) < len(snap.files)  # and others are pruned


def test_type_mismatch_and_cap_fall_back(spark, bloom_table):
    log = bloom_table
    snap = log.snapshot()
    # int (not long) source keys: hashes would diverge — no pruning
    src_int = spark.range(5).select(
        F.col("id").cast("int").alias("k")
    )
    assert log._bloom_key_candidates(
        snap, src_int, "k", sorted(snap.files)
    ) == sorted(snap.files)

    # over the probe cap: range-only
    import aligned_spark.sources.bloom as B

    old = B.MAX_PROBE_KEYS
    B.MAX_PROBE_KEYS = 10
    try:
        big = _uniform(spark, 0, 1000).select("k")
        assert log._bloom_key_candidates(
            snap, big, "k", sorted(snap.files)
        ) == sorted(snap.files)
    finally:
        B.MAX_PROBE_KEYS = old


def test_blooms_survive_checkpoint_and_merge(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl, checkpoint_interval=5)
    log.write(_uniform(spark, 0, 5_000, n_files=4))
    log.set_bloom_filter(["k"], fpp=1e-6)
    log.optimize(spark)
    # cross the checkpoint boundary with appends and a merge
    for i in range(4):
        log.write(_uniform(spark, 5_000 + i * 100, 5_100 + i * 100, 1))
    src = (
        log.read(spark).limit(50).select("k", F.lit(-7).alias("v"))
    )
    log.merge_upsert(src, ["k"])
    assert log.latest_version() > 5  # checkpoint written
    snap = log.snapshot()
    assert any(
        (a.get("bloomFilters") or {}).get("k")
        for a in snap.files.values()
    )
    # merged rows correct under pruned reads
    key = src.first()["k"]
    got = log.read(spark, skipping=[("k", "=", key)]).filter(
        F.col("k") == key
    )
    assert [r.v for r in got.collect()] == [-7]


def test_vacuum_reaps_orphaned_sidecars(spark, tmp_path):
    tbl = str(tmp_path / "t")
    log = DeltaLog(tbl)
    log.write(_uniform(spark, 0, 2_000, n_files=4))
    log.set_bloom_filter(["k"])
    # explicit multi-file target (size-targeted staging would
    # rightly compact 2k rows to one file, leaving no orphan delta)
    log.optimize(spark, target_rows_per_file=500)
    before = set(glob.glob(os.path.join(tbl, "_bloom", "*.bloom")))
    assert before
    log.write(_uniform(spark, 0, 100, n_files=2), mode="overwrite")
    log.vacuum(retention_seconds=0)
    after = set(glob.glob(os.path.join(tbl, "_bloom", "*.bloom")))
    live = {
        os.path.join(tbl, m["path"])
        for a in log.snapshot().files.values()
        for m in (a.get("bloomFilters") or {}).values()
    }
    assert after == live  # orphans gone, live sidecars kept
    assert len(after) < len(before)


def test_lookup_scans_one_file(spark, bloom_table):
    """File-count plan pin for the `source_delta_bloom_lookup`
    driver query's claim: a present-key point read plans ~1 input
    file (vs every file under range-only stats on a hash layout),
    and a miss plans ZERO."""
    log = bloom_table
    snap = log.snapshot()
    n_all = len(snap.files)
    key = log.read(spark).select("k").first()["k"]
    hit = log.read(spark, skipping=[("k", "=", key)])
    assert len(hit.inputFiles()) == 1 < n_all
    miss = log.read(spark, skipping=[("k", "=", 123_456_789)])
    assert miss.inputFiles() == []
    # range-only control: stats alone keep every file a candidate
    range_only = [
        p
        for p in sorted(snap.files)
        if _file_may_match(snap.files[p], [("k", "=", key)])
    ]
    assert len(range_only) == n_all
