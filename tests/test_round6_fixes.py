"""Regression tests for the round-6 ADVICE fixes.

1. ``k_anonymity(mode="suppress")`` must treat NULL quasi-identifier
   values as class members (eqNullSafe semi-join), consistently with
   the groups/violations counts.
2. The BERT-mode WordPiece pre-tokenizer uses an explicit ASCII
   whitespace class (RE2 ``\\s`` lacks ``\\x0b``) so kernel and
   DuckDB oracle agree on U+000B.
3. ``pagerank`` unpersists its cached frames (no storage leak per
   call) while still returning correct ranks.
4. ``load_vocab`` tolerates CRLF line endings.
"""

import duckdb

from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- 1


def test_k_anonymity_suppress_null_class_kept(spark):
    from aligned_spark.operators.quality import k_anonymity

    rows = (
        [Row(city=None, age=30, uid=i) for i in range(3)]
        + [Row(city="oslo", age=None, uid=10 + i) for i in range(3)]
        + [Row(city="bergen", age=40, uid=20)]  # n=1 < k → suppress
    )
    df = spark.createDataFrame(rows)

    groups = k_anonymity(df, ["city", "age"], k=2, mode="groups")
    audit = {
        (r.city, r.age): (r.n_rows, r.violates)
        for r in groups.collect()
    }
    assert audit[(None, 30)] == (3, False)
    assert audit[("oslo", None)] == (3, False)
    assert audit[("bergen", 40)] == (1, True)

    released = k_anonymity(df, ["city", "age"], k=2, mode="suppress")
    kept = sorted(r.uid for r in released.collect())
    # NULL-valued classes whose audit passes must be RELEASED, not
    # silently dropped by a null-rejecting equality join.
    assert kept == [0, 1, 2, 10, 11, 12]


def test_k_anonymity_suppress_null_violating_class_dropped(spark):
    from aligned_spark.operators.quality import k_anonymity

    rows = [Row(city=None, uid=0)] + [
        Row(city="oslo", uid=1 + i) for i in range(2)
    ]
    df = spark.createDataFrame(rows)
    released = k_anonymity(df, ["city"], k=2, mode="suppress")
    assert sorted(r.uid for r in released.collect()) == [1, 2]


# ---------------------------------------------------------------- 2


def test_bert_pretokenizer_vertical_tab_matches_oracle(spark):
    """U+000B between words: kernel and RE2 oracle must bill the same
    token count (previously Python-\\s treated it as whitespace while
    the RE2 oracle emitted it as a single-char token)."""
    from aligned_spark.functions.tokenizer import wordpiece_token_count

    vocab = ["hello", "world", "[UNK]"]
    text = "hello\x0bworld"
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    out = wordpiece_token_count(
        df, "doc_id", "text", vocab, split_mode="bert"
    ).collect()[0]

    con = duckdb.connect()
    n_oracle = con.execute(
        "SELECT len(regexp_extract_all(lower(?), "
        "'[a-z0-9]+|[^a-z0-9 \t\n\x0b\f\r]'))",
        [text],
    ).fetchone()[0]
    # \x0b is whitespace on BOTH sides now: 2 word tokens.
    assert n_oracle == 2
    assert out.n_tokens == 2
    assert out.n_unk == 0


def test_poly_ws_sql_mirror_includes_vertical_tab(spark):
    """sql_ws_word_hashes must split on \\x0b exactly like the Python
    kernel (_WS_ASCII) and Java \\s."""
    from aligned_spark.functions.text_poly import (
        sql_ws_word_hashes,
        ws_word_hashes,
    )

    text = "alpha\x0bbeta gamma"
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS text", [text])
    sql_hashes = con.execute(
        f"SELECT {sql_ws_word_hashes('text')} FROM t"
    ).fetchone()[0]
    assert list(sql_hashes) == ws_word_hashes(text)
    assert len(sql_hashes) == 3  # \x0b IS a separator everywhere


# ---------------------------------------------------------------- 3


def test_pagerank_unpersists_cached_frames(spark):
    from aligned_spark.operators.graph import pagerank

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (3, 1), (4, 1)]]
    )
    ranks = pagerank(
        edges, iterations=2, redistribute_dangling=True
    )
    got = {r.node: r.pr for r in ranks.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(v > 0 for v in got.values())
    after = jsc.getPersistentRDDs().size()
    # Exactly one persisted RDD may remain: the final local
    # checkpoint backing the RETURNED frame (freed by the
    # ContextCleaner when the caller drops it). nodes/edges/dangling
    # and every intermediate iteration must be released.
    assert after <= before + 1, (
        f"pagerank leaked {after - before} persisted RDD(s)"
    )


def test_pagerank_dangling_mass_conserved_after_fix(spark):
    from aligned_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in [(1, 2), (2, 3), (1, 3)]]
    )
    ranks = pagerank(edges, iterations=3, redistribute_dangling=True)
    total = ranks.agg(F.sum("pr")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


# ---------------------------------------------------------------- 4


def test_load_vocab_crlf(tmp_path):
    from aligned_spark.functions.tokenizer import load_vocab

    p = tmp_path / "vocab.txt"
    p.write_bytes(b"hello\r\nworld\r\n\r\n##ing\r\n")
    assert load_vocab(str(p)) == ["hello", "world", "##ing"]


# ------------------------------------------------- round-6 additions


def test_ece_frame_matches_float_ece_and_handles_empty(spark):
    from aligned_spark.operators.quality import (
        calibration_bins,
        ece,
        ece_frame,
    )

    rows = [
        Row(score=s, label=l)
        for s, l in [
            (0.05, 0), (0.12, 0), (0.18, 1), (0.43, 0),
            (0.47, 1), (0.55, 1), (0.81, 1), (0.88, 0),
            (0.93, 1), (0.97, 1), (None, 1), (1.5, 0),
        ]
    ]
    df = spark.createDataFrame(rows)
    frame = ece_frame(df, "score", "label").collect()[0]
    assert frame.n_total == 10  # null + out-of-range filtered
    # integer-numerator identity vs the bin-level float formula
    bins = calibration_bins(df, "score", "label").collect()
    float_ece = sum(
        b.n / frame.n_total * abs(b.accuracy - b.mean_score)
        for b in bins
    )
    assert abs(frame.ece - float_ece) < 1e-12
    assert abs(ece(df, "score", "label") - frame.ece) < 1e-15

    empty = spark.createDataFrame([], "score double, label bigint")
    assert ece(empty, "score", "label") == 0.0
    r = ece_frame(empty, "score", "label").collect()[0]
    assert r.n_total is None and r.ece is None
