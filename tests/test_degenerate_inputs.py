"""Degenerate-input robustness: empty frames, all-empty text, and
single-row inputs through the main operator families. At 100 TB a
daily partition CAN be empty (holiday, outage backfill) — operators
must return empty/identity results, not throw."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1)


def _empty_events(spark):
    return spark.createDataFrame(
        [], "user_id long, ts timestamp, value double"
    )


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_aggregates_on_empty(spark):
    from aligned_spark.operators.aggregate import (
        AggSpec,
        group_aggregate,
        hopping_aggregate,
        rolling_aggregate,
    )

    ev = _empty_events(spark)
    aggs = [AggSpec("s", "sum", "value"), AggSpec("n", "count", None)]
    assert group_aggregate(ev, ["user_id"], aggs).count() == 0
    assert rolling_aggregate(
        ev, keys=["user_id"], ts="ts", window_seconds=60, aggs=aggs
    ).count() == 0
    assert hopping_aggregate(
        ev, keys=["user_id"], ts="ts", every_seconds=60,
        period_seconds=60, aggs=aggs,
    ).count() == 0


def test_joins_on_empty_sides(spark):
    from aligned_spark.operators.joins import asof_join, pit_join

    ev = _empty_events(spark)
    facts = spark.createDataFrame(
        [(1, T0)], "user_id long, ts timestamp"
    )
    # empty features: every fact row survives with null payload
    out = asof_join(facts, ev, on="ts", by=["user_id"]).collect()
    assert len(out) == 1 and out[0].value is None
    # empty facts: empty result
    assert asof_join(
        facts.limit(0), ev, on="ts", by=["user_id"]
    ).count() == 0
    # bucketed path, both empty
    assert pit_join(
        facts.limit(0).withColumnRenamed("ts", "fts"), ev,
        entities=["user_id"], feature_ts="ts", fact_ts="fts",
        bucket_seconds=60.0,
    ).count() == 0


def test_dedup_and_text_on_empty(spark):
    from aligned_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
        simhash_near_dup_pairs,
    )
    from aligned_spark.operators.quality import (
        dup_ngram_char_fraction,
        top_ngram_fraction,
    )
    from aligned_spark.operators.text_rank import (
        bm25_scores,
        inverted_index,
        unigram_surprise,
    )

    d = _empty_docs(spark)
    assert exact_dedup(d, ["text"], order_col="doc_id").count() == 0
    assert minhash_dedup(d, "doc_id", "text").count() == 0
    assert simhash_near_dup_pairs(d, "doc_id", "text").count() == 0
    assert inverted_index(d, "doc_id", "text").count() == 0
    assert unigram_surprise(d, "doc_id", "text").count() == 0
    assert bm25_scores(d, "doc_id", "text", ["x"]).count() == 0
    assert top_ngram_fraction(d, ["doc_id"], "text").count() == 0
    assert dup_ngram_char_fraction(d, ["doc_id"], "text").count() == 0

    # all-empty text: no shingles anywhere — no pairs, no crash
    d2 = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert minhash_dedup(d2, "doc_id", "text").count() == 3  # kept as-is
    assert simhash_near_dup_pairs(d2, "doc_id", "text").count() == 0


def test_sampling_sessions_resample_on_empty(spark):
    from aligned_spark.operators.core import resample
    from aligned_spark.operators.quality import (
        histogram,
        normalize_scores,
        profile_table,
    )
    from aligned_spark.operators.sampling import pack_documents
    from aligned_spark.operators.sessions import sessionize
    from aligned_spark.streaming import drop_late_events

    ev = _empty_events(spark)
    assert sessionize(ev, ["user_id"], "ts", 60).count() == 0
    assert resample(ev, ["user_id"], "ts", 60.0).count() == 0
    assert drop_late_events(
        ev.withColumn("arr", F.lit(0)), "ts", 60, "arr"
    ).count() == 0
    assert histogram(ev, "value", 1.0, keys=["user_id"]).count() == 0
    assert normalize_scores(ev, ["user_id"], "value").count() == 0
    d = spark.createDataFrame([], "doc_id long, src string, tokens long")
    assert pack_documents(
        d, keys=["src"], order_col="doc_id", token_col="tokens",
        budget=512,
    ).count() == 0
    # profile on empty frame: one row per column, zero counts
    prof = {r.column: (r.n_nulls, r.n_distinct)
            for r in profile_table(ev).collect()}
    assert prof["user_id"] == (0, 0)


def test_top_frequent_and_corr_degenerate(spark):
    from aligned_spark.operators.aggregate import top_frequent
    from aligned_spark.operators.decompose import correlation_matrix

    ev = _empty_events(spark)
    assert top_frequent(ev, ["user_id"], "value", 3).count() == 0

    # k larger than the distinct count: every value ranks
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2)], "g string, v long"
    )
    rows = {(r.value, r.n_occurrences, r.rank)
            for r in top_frequent(df, ["g"], "v", 10).collect()}
    assert rows == {(1, 2, 1), (2, 1, 2)}

    # constant column → undefined correlation must surface as NULL,
    # not crash or fabricate a number
    c = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, k double"
    )
    got = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(c, ["x", "k"]).collect()}
    assert got[("x", "k")] is None

    import pytest

    with pytest.raises(ValueError, match="at least two"):
        correlation_matrix(c, ["x"])


def test_new_round4_ops_on_empty(spark):
    """duplicate_spans / fuzzy_join / winsorize / global_row_ids /
    pagerank / sample_frames on empty frames: no crash, empty (or
    well-defined) output with the declared schema."""
    from aligned_spark.functions.multimodal import sample_frames
    from aligned_spark.operators.core import global_row_ids
    from aligned_spark.operators.dedup import duplicate_spans
    from aligned_spark.operators.graph import pagerank
    from aligned_spark.operators.joins import fuzzy_join
    from aligned_spark.operators.quality import cdf_normalize, winsorize

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    out = duplicate_spans(empty_docs, "doc_id", "text", width=3)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "total_windows", "dup_windows", "max_dup_run",
        "dup_fraction",
    }

    e1 = spark.createDataFrame([], "a long, s string")
    e2 = spark.createDataFrame([], "b long, t string")
    assert fuzzy_join(e1, e2, "s", "t").count() == 0

    ev = spark.createDataFrame([], "g string, v double")
    assert winsorize(ev, ["g"], "v").count() == 0
    assert cdf_normalize(ev, ["g"], "v").count() == 0

    er = spark.createDataFrame([], "k long, v long")
    assert global_row_ids(er, ["v", "k"], num_partitions=4).count() == 0

    eb = spark.createDataFrame([], "id long, media binary")
    assert sample_frames(eb, "media", ["id"]).count() == 0

    # pagerank needs >=1 node (1/N init); a graph with no edges is a
    # caller error — single self-loop degenerates gracefully
    loop = spark.createDataFrame([(1, 1)], "src long, dst long")
    r = pagerank(loop, iterations=2).collect()
    assert len(r) == 1 and abs(r[0].pr - 1.0) < 1e-12


def test_session_ops_on_empty(spark):
    """This session's operators on empty frames: all must return
    empty (or identity) results with the right schema, not throw."""
    from aligned_spark.operators.aggregate import (
        exact_percentiles_counting,
    )
    from aligned_spark.operators.core import lag_features
    from aligned_spark.operators.dedup import fuzzy_decontaminate
    from aligned_spark.operators.quality import (
        mad_outliers,
        quantile_bins,
        token_entropy,
    )
    from aligned_spark.operators.sampling import (
        chunk_documents,
        weighted_reservoir_k,
    )

    docs = _empty_docs(spark)
    ev = _empty_events(spark)

    out = chunk_documents(docs, "doc_id", "text", 100, 10)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "chunk_idx", "chunk_start",
                                "chunk"}

    out = lag_features(ev, ["user_id"], "ts", ["value"])
    assert out.count() == 0 and "gap_us" in out.columns

    some = spark.createDataFrame(
        [(0, "hello world text here")], "doc_id long, text string"
    )
    # empty benchmark → nothing flagged, corpus passes through
    assert fuzzy_decontaminate(
        some, docs, "doc_id", "text", "text"
    ).count() == 1
    # empty corpus → empty result
    assert fuzzy_decontaminate(
        docs, some, "doc_id", "text", "text"
    ).count() == 0

    g = spark.createDataFrame([], "grp string, v double")
    assert mad_outliers(g, ["grp"], "v").count() == 0
    assert quantile_bins(g, ["grp"], "v", 4).count() == 0
    assert token_entropy(docs, ["doc_id"], "text").count() == 0
    assert weighted_reservoir_k(
        g.withColumn("row_id", F.lit(0).cast("long")),
        "grp", ["row_id"], "v", k=3,
    ).count() == 0
    out = exact_percentiles_counting(g, ["grp"], "v", [0.5, 0.9])
    assert out.count() == 0
    assert set(out.columns) == {"grp", "p0_5", "p0_9"}


def test_session_ops_single_row(spark):
    """Single-row groups: percentile of one value is the value; lag is
    NULL; reservoir returns the row; one chunk for a short doc."""
    from aligned_spark.operators.aggregate import (
        exact_percentiles_counting,
    )
    from aligned_spark.operators.core import lag_features
    from aligned_spark.operators.quality import mad_outliers

    one = spark.createDataFrame([("g", 7.25)], "grp string, v double")
    r = exact_percentiles_counting(one, ["grp"], "v", [0.0, 0.5, 1.0])
    row = r.collect()[0]
    assert row.p0_0 == row.p0_5 == row.p1_0 == 7.25

    ev = spark.createDataFrame(
        [(1, 1, T0, 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = lag_features(ev, ["user_id"], "ts", ["value"]).collect()[0]
    assert row.gap_us is None and row.value_delta is None

    row = mad_outliers(one, ["grp"], "v").collect()[0]
    assert row.is_outlier is False  # MAD 0 → nothing flagged


def test_third_pass_ops_on_empty_and_trivial(spark):
    """Session ops survive empty frames, all-empty text, and inputs
    below their structural minimums (one doc, no overlap, no edges)."""
    docs = _empty_docs(spark)

    from aligned_spark.operators.quality import (
        hashed_classifier_score,
        shrunk_group_means,
    )

    assert hashed_classifier_score(docs, "doc_id", "text").count() == 0
    one = spark.createDataFrame([(0, "", None)],
                                "doc_id long, text string, g string")
    r = hashed_classifier_score(one, "doc_id", "text").first()
    assert r.logit == 0.0 and r.keep == 0

    empty_vals = spark.createDataFrame([], "g string, v double")
    assert shrunk_group_means(empty_vals, ["g"], "v").count() == 0
    # all-null value group: n=0 → raw/shrunk are NULL, not a crash
    nulls = spark.createDataFrame([("a", None)], "g string, v double")
    row = shrunk_group_means(nulls, ["g"], "v").first()
    assert row.n == 0

    from aligned_spark.operators.text_rank import (
        trigram_backoff_surprise,
    )

    assert trigram_backoff_surprise(docs, docs, "doc_id", "text").count() == 0
    # empty TRAIN corpus: the OOV floor divides by N=0 — the row
    # surfaces with an explicit NULL surprise (visible degenerate),
    # never a silent inf/NaN or a crash
    sc = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    out = trigram_backoff_surprise(docs, sc, "doc_id", "text").collect()
    assert len(out) == 1 and out[0].avg_neg_logp3 is None

    from aligned_spark.operators.dedup import bloom_decontaminate

    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    # empty benchmark → nothing flagged, corpus passes through
    assert bloom_decontaminate(
        corpus, docs, "doc_id", "text", "text", impl="poly"
    ).count() == 1

    from aligned_spark.operators.similarity import prefix_jaccard_pairs

    assert prefix_jaccard_pairs(docs, "doc_id", "text", 0.5).count() == 0
    assert prefix_jaccard_pairs(corpus, "doc_id", "text", 0.5).count() == 0

    from aligned_spark.operators.graph import triangles

    no_edges = spark.createDataFrame([], "a long, b long")
    assert triangles(no_edges).count() == 0

    from aligned_spark.operators.core import ewma_features

    ev = _empty_events(spark)
    assert ewma_features(ev, ["user_id"], "ts", "value").count() == 0

    from aligned_spark.operators.joins import interval_overlap_join

    li = spark.createDataFrame([], "l long, lo double, hi double")
    ri = spark.createDataFrame([], "r long, r_lo double, r_hi double")
    assert interval_overlap_join(
        li, ri, "lo", "hi", "r_lo", "r_hi", bin_width=1.0
    ).count() == 0

    from aligned_spark.functions.audio import audio_window_features

    blobs = spark.createDataFrame([], "doc_id long, blob binary")
    assert audio_window_features(blobs, "doc_id", "blob").count() == 0
