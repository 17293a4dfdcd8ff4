"""The poly hash family must agree between its three incarnations:
pure-Python kernels, the Spark pandas-UDF wrappers, and the DuckDB SQL
builders (the driver oracle replays the latter). Tricky inputs: empty
docs, sub-width docs, unicode accents, punctuation-only."""

import duckdb
import pytest
from pyspark.sql import functions as F

from aligned_spark.functions import text_poly as tp

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup
    (3, ""),
    (4, None),
    (5, "só àçcénts ünd ÿmlauts véry wéll"),
    (6, "short"),
    (7, "two words"),
    (8, "...!!! ??? 123 456"),  # no tokens at all
    (9, "a b c d e f g h i j k l m n o p"),
]


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in DOCS)
        + ") t(doc_id, text)",
        [x for row in DOCS for x in row],
    )
    return con.execute(sql).fetchall()


def test_python_vs_duckdb_builders():
    rows = _duck(
        f"""WITH wh AS (SELECT doc_id, {tp.sql_word_hashes('text')} AS wh
                        FROM documents),
            sh AS (SELECT doc_id, {tp.sql_window_hashes('wh', 3)} AS sh
                   FROM wh)
            SELECT doc_id, sh, {tp.sql_simhash('sh')} FROM sh
            ORDER BY doc_id"""
    )
    for doc_id, sh, sig in rows:
        text = DOCS[doc_id][1]
        assert list(sh) == tp.window_hashes(text, 3), doc_id
        assert sig == tp.simhash_value(text, 3), doc_id


def test_python_vs_duckdb_minhash_and_bands():
    sql = f"""WITH wh AS (SELECT doc_id, {tp.sql_word_hashes('text')} AS wh
                          FROM documents),
        sh AS (SELECT doc_id, {tp.sql_window_hashes('wh', 3)} AS sh FROM wh),
        sig AS (SELECT doc_id, {tp.sql_minhash_sig('sh', 8)} AS sig
                FROM sh WHERE len(sh) > 0)
        SELECT doc_id, sig,
               [{', '.join(tp.sql_band_hash('sig', str(b), 2) for b in range(4))}]
        FROM sig ORDER BY doc_id"""
    rows = _duck(sql)
    seen = set()
    for doc_id, sig, bands in rows:
        text = DOCS[doc_id][1]
        seen.add(doc_id)
        assert list(sig) == tp.minhash_signature(text, 8, 3), doc_id
        assert list(bands) == tp.band_hashes(text, 8, 4, 3), doc_id
    # un-shingleable docs are excluded on both sides
    assert seen == {d for d, t in DOCS if len(tp.window_hashes(t, 3)) > 0}


def test_python_vs_duckdb_trigram_buckets():
    rows = _duck(
        f"""WITH ch AS (SELECT doc_id,
              list_transform(string_split_regex(lower(coalesce(text, '')), ''),
                             c -> CAST(ord(c) AS HUGEINT)) AS cp
              FROM documents)
            SELECT doc_id, {tp.sql_trigram_buckets('cp', 16)} FROM ch
            ORDER BY doc_id"""
    )
    for doc_id, buckets in rows:
        text = DOCS[doc_id][1]
        expect = tp.trigram_bucket_counts(text, 16)
        counts = [0] * 16
        for b in buckets:
            counts[b] += 1
        assert counts == expect, doc_id


def test_spark_wrappers_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = df.select(
        "doc_id",
        tp.poly_band_hashes_arrow(F.col("text"), 8, 4, 3).alias("bh"),
        tp.poly_simhash_arrow(F.col("text"), 3).alias("sim"),
        tp.poly_fingerprint_arrow(F.col("text"), 3).alias("fp"),
        tp.poly_shingle_hashes_arrow(F.col("text"), 3).alias("sh"),
    ).collect()
    for r in out:
        text = DOCS[r.doc_id][1]
        assert list(r.bh) == tp.band_hashes(text, 8, 4, 3)
        assert r.sim == tp.simhash_value(text, 3)
        assert r.fp == tp.fingerprint_value(text, 3)
        assert list(r.sh) == sorted(set(tp.window_hashes(text, 3)))


def test_poly_minhash_dedup_semantics(spark):
    """Exact dup always collides in every band; keep-min drops the
    larger id."""
    from aligned_spark.operators.dedup import (
        minhash_dedup,
        minhash_near_dup_pairs,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = minhash_near_dup_pairs(
        df, "doc_id", "text", num_hashes=8, bands=4, impl="poly"
    )
    got = {(r.doc_id_a, r.doc_id_b) for r in pairs.collect()}
    assert (0, 1) in got
    kept = minhash_dedup(
        df, "doc_id", "text", num_hashes=8, bands=4,
        jaccard_threshold=0.8, impl="poly",
    )
    ids = {r.doc_id for r in kept.collect()}
    assert 0 in ids and 1 not in ids


def test_poly_simhash_pairs_pigeonhole(spark):
    """Brute-force Hamming ≤ 3 over poly signatures == banded output
    (pigeonhole recall is exact, not probabilistic)."""
    from aligned_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    sigs = {d: tp.simhash_value(t, 3) for d, t in DOCS}
    expect = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b
        and sigs[a] != 0
        and sigs[b] != 0
        and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    out = simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=3, impl="poly")
    got = {(r.doc_id_a, r.doc_id_b) for r in out.collect()}
    assert got == expect


def test_decontaminate(spark):
    """Planted 3-shingle overlap: doc 0 shares a 3-gram with the
    benchmark, doc 1 does not; too-short docs are never flagged."""
    from aligned_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "the secret benchmark passage is hidden here today"),
            (1, "completely unrelated text with different words"),
            (2, "tiny"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we know the secret benchmark passage appears")],
        "doc_id long, text string",
    )
    for impl in ("poly", "arrow"):
        clean = decontaminate(
            corpus, bench, "doc_id", "text", "text",
            shingle_width=3, impl=impl,
        )
        assert {r.doc_id for r in clean.collect()} == {1, 2}, impl
        flagged = decontaminate(
            corpus, bench, "doc_id", "text", "text",
            shingle_width=3, impl=impl, keep_contaminated=True,
        )
        assert {r.doc_id for r in flagged.collect()} == {0}, impl
