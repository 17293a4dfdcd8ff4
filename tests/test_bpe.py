"""Byte-level BPE tokenizer (`functions/tokenizer.py`): round-trip
properties, schedule equivalence (merge-all vs leftmost-one-at-a-time
— the oracle's replay), fixture loading, and the Spark kernel."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aligned_spark", "resources", "bpe_merges.txt",
)


def _ranks(limit=None):
    from aligned_spark.functions.tokenizer import load_merges

    merges = load_merges(FIXTURE, limit=limit)
    return {m: i for i, m in enumerate(merges)}


def _bpe_one_at_a_time(word, ranks):
    """The oracle's schedule: leftmost occurrence of the lowest-rank
    pair, one merge per step."""
    syms = list(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def test_fixture_loads_with_header_and_ranks():
    from aligned_spark.functions.tokenizer import load_merges

    merges = load_merges(FIXTURE)
    assert len(merges) >= 80
    assert all(len(p) == 2 and p[0] and p[1] for p in merges)
    assert load_merges(FIXTURE, limit=40) == merges[:40]
    # trained-table invariant the oracle's equivalence proof rests
    # on: any pair SYMBOL is formed before (ranked under) every pair
    # that uses it
    formed = {a + b: r for r, (a, b) in enumerate(merges)}
    for r, (a, b) in enumerate(merges):
        for side in (a, b):
            if len(side) > 1:
                assert formed[side] < r


WORDS = st.text(alphabet="abcde01", min_size=1, max_size=16)


@given(WORDS)
@settings(max_examples=300, deadline=None)
def test_bpe_word_concatenation_roundtrip(word):
    from aligned_spark.functions.tokenizer import bpe_word

    toks = bpe_word(word, _ranks(limit=40))
    assert "".join(toks) == word
    assert all(toks)


@given(WORDS)
@settings(max_examples=300, deadline=None)
def test_bpe_schedules_agree_on_trained_table(word):
    from aligned_spark.functions.tokenizer import bpe_word

    ranks = _ranks()  # full table
    assert bpe_word(word, ranks) == _bpe_one_at_a_time(word, ranks)


def test_bpe_greedy_rank_order_matters():
    from aligned_spark.functions.tokenizer import bpe_word

    # ranks: (a,b) before (b,c) — "abc" must become ["ab","c"]
    assert bpe_word("abc", {("a", "b"): 0, ("b", "c"): 1}) == ["ab", "c"]
    assert bpe_word("abc", {("a", "b"): 1, ("b", "c"): 0}) == ["a", "bc"]
    # overlapping pair merges left-to-right, non-overlapping
    assert bpe_word("aaa", {("a", "a"): 0}) == ["aa", "a"]
    assert bpe_word("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == ["aaaa"]


def test_bpe_token_count_kernel(spark):
    from aligned_spark.functions.tokenizer import (
        bpe_token_count,
        bpe_word,
        load_merges,
    )

    merges = load_merges(FIXTURE, limit=40)
    ranks = {m: i for i, m in enumerate(merges)}
    rows = [
        Row(doc_id=0, text="The wind and the rain!"),
        Row(doc_id=1, text=""),
        Row(doc_id=2, text=None),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.doc_id: (r.n_tokens, r.n_words)
        for r in bpe_token_count(df, "doc_id", "text", merges).collect()
    }
    import re

    words = re.findall(r"[a-z0-9]+", rows[0].text.lower())
    expect = sum(len(bpe_word(w, ranks)) for w in words)
    assert got[0] == (expect, len(words))
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
