"""Corpus-statistics text scoring: BM25 retrieval scores and
unigram-LM surprise (the CCNet/Gopher-style "perplexity filter").

No reference counterpart — the reference has no ranking or LM-scoring
operators; these belong to the training-data-pipeline pillar this
engine adds (SURVEY.md §6). Both are pure DataFrame composition:
tokenize → explode → aggregate → join term statistics back — no UDFs,
fully whole-stage-codegen.

Scale shape: token explode is a flatMap (no shuffle); term statistics
(document frequency, unigram counts) aggregate map-side to one row per
TERM — vocabulary-sized, millions of rows at web scale, not corpus-
sized — and join back on the term key (Spark broadcasts when small,
AQE picks shuffle-hash above that). Per-document reductions shuffle on
doc_id once.

Float determinism (driver hash vs DuckDB): every transcendental
(ln) is epsilon-floor-rounded to 6 decimals the moment it is computed;
subsequent *,/ are identical-order IEEE ops; per-document sums go
through DECIMAL(18,6) so addition order cannot matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"


def _r6(col: Column) -> Column:
    """Epsilon-floor round to 6 decimals (bit-identical both engines)."""
    return (
        F.floor(col * F.lit(1e6) + F.lit(0.5) + F.lit(1e-9)).cast("double")
        / F.lit(1e6)
    )


def _dsum6(col: Column) -> Column:
    """Order-independent exact sum of 6-decimal values → double.

    The inputs are already r6-rounded (exact multiples of 1e-6), so
    ``floor(x·1e6 + 0.5)`` recovers the exact scaled integer and the
    sum runs on a primitive long accumulator — a decimal SUM's result
    precision (28) would box a BigDecimal per row (see PERF.md)."""
    return (
        F.sum(F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long"))
        .cast("double")
        / F.lit(1e6)
    )


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) pairs: lowercase, split on non-alphanumerics."""
    return (
        df.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_RE)
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against a fixed query term set.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  [Robertson-Sparck
    Jones, the Lucene variant], tf saturation with ``k1`` and length
    normalization ``b`` against the corpus mean length. Documents
    matching no query term score 0. Output: (id, bm25) for every
    input document.
    """
    toks = tokenize(docs, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    # two corpus scalars (N, avgdl) — 1-row frame, broadcast into the
    # per-term join; division order identical on the oracle side
    n_docs = docs.select(
        F.count(F.lit(1)).alias("__n")
    )
    stats = dl.select(F.sum("__dl").alias("__sumdl")).crossJoin(
        F.broadcast(n_docs)
    )
    q = [t.lower() for t in query_terms]
    qtoks = toks.filter(F.col("token").isin(q))
    dfreq = qtoks.groupBy("token").agg(
        F.count_distinct(F.col(id_col)).alias("__df")
    )
    tf = qtoks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = _r6(
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
    )
    avgdl = F.col("__sumdl").cast("double") / F.col("__n")
    score_t = _r6(
        idf
        * (F.col("__tf") * F.lit(k1 + 1.0))
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
        )
    )
    scored = per_term.groupBy(id_col).agg(
        _dsum6(score_t).alias("bm25")
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .withColumn("bm25", F.coalesce(F.col("bm25"), F.lit(0.0)))
    )


def inverted_index(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Build an inverted index: one row per token with its document
    frequency and the sorted posting list of document ids.

    Scale note: posting-list size follows token frequency — at web
    scale the head tokens ("the") would concentrate gigabyte postings
    on single reducers. The deployment answer is posting SHARDS
    (``(token, shard, postings)`` with shard = doc_id bucket), which
    is this same plan plus one more group key; the unsharded form
    here is the oracle-checkable core.
    """
    pairs = tokenize(docs, id_col, text_col).distinct()
    return pairs.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
    )


def inverted_index_sharded(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_shards: int = 16,
) -> DataFrame:
    """Sharded inverted index: ``(token, shard)`` → sorted postings,
    shard = doc_id bucket. The web-scale form of
    :func:`inverted_index` — a head token's postings spread over
    ``num_shards`` reducers instead of one; readers union the shards
    of a token (order across shards is by construction doc_id-range
    disjoint only if ids are range-bucketed; hash shards trade that
    for balance)."""
    pairs = tokenize(docs, id_col, text_col).distinct()
    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    return (
        pairs.withColumn("shard", shard)
        .groupBy("token", "shard")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("postings"),
        )
    )


def bigram_surprise(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Mean negative log conditional probability under the corpus's
    own bigram LM: ``-mean log p(w_i | w_{i-1})`` with
    ``p(w|prev) = count(prev, w) / count_as_prev(prev)``.

    One step closer to a KenLM perplexity filter than
    :func:`unigram_surprise` — repetitive/templated text scores
    near 0 (its transitions are always seen), shuffled or
    wrong-language text scores high. The first token of each doc has
    no predecessor and is skipped (documents with < 2 tokens are
    absent from the output).

    Scale shape: bigram explode (flatMap), bigram-count and
    prev-count tables are vocabulary²-bounded but corpus-Zipf small,
    joined back on the bigram key; one final per-doc reduction.
    """
    toks = docs.select(
        id_col,
        F.explode(
            _bigrams(F.lower(F.col(text_col)))
        ).alias("__bg"),
    )
    bg_counts = toks.groupBy("__bg").agg(
        F.count(F.lit(1)).alias("__cbg")
    )
    prev_counts = toks.select(
        F.split_part(F.col("__bg"), F.lit(" "), F.lit(1)).alias("__prev")
    ).groupBy("__prev").agg(F.count(F.lit(1)).alias("__cprev"))
    surprise = _r6(
        -F.log(
            F.col("__cbg").cast("double") / F.col("__cprev").cast("double")
        )
    )
    return (
        toks.join(bg_counts, "__bg")
        .withColumn(
            "__prev", F.split_part(F.col("__bg"), F.lit(" "), F.lit(1))
        )
        .join(prev_counts, "__prev")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            _dsum6(surprise).alias("__s"),
        )
        .withColumn(
            "avg_neg_logp2", _r6(F.col("__s") / F.col("n_bigrams"))
        )
        .drop("__s")
    )


def _bigrams(text: Column) -> Column:
    """Adjacent word pairs 'a b' over the standard tokenization."""
    words = F.filter(
        F.split(text, TOKEN_RE), lambda w: w != F.lit("")
    )
    n = F.size(words)
    firsts = F.slice(words, 1, F.greatest(n - 1, F.lit(0)))
    seconds = F.slice(words, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(
        firsts, seconds, lambda a, b: F.concat_ws(" ", a, b)
    )


def unigram_surprise(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's
    own unigram language model — the scalable stand-in for a
    KenLM-style perplexity filter: high surprise = unusual token
    distribution (boilerplate, gibberish, wrong language).

    p(t) = count(t) / total_tokens over the WHOLE corpus (the model
    is the corpus itself, so no smoothing is needed — every scored
    token was counted). Output: (id, n_tokens, avg_neg_logp) for
    every document with at least one token.
    """
    toks = tokenize(docs, id_col, text_col)
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__c"))
    total = vocab.select(F.sum("__c").alias("__total"))
    surprise = _r6(
        -F.log(
            F.col("__c").cast("double") / F.col("__total").cast("double")
        )
    )
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            _dsum6(surprise).alias("__s"),
        )
        .withColumn(
            "avg_neg_logp",
            _r6(F.col("__s") / F.col("n_tokens")),
        )
        .drop("__s")
    )
    return scored


def _trigram_parts(text: Column) -> Column:
    """Array of structs (ctx='w1 w2', tg='w1 w2 w3', b23='w2 w3',
    w2, w3) — one per trigram slot, document order."""
    words = F.filter(F.split(text, TOKEN_RE), lambda w: w != F.lit(""))
    n = F.size(words)
    m = F.greatest(n - 2, F.lit(0))
    a = F.slice(words, 1, m)
    b = F.slice(words, 2, m)
    c = F.slice(words, 3, m)
    ab = F.zip_with(
        a, b, lambda x, y: F.struct(x.alias("w1"), y.alias("w2"))
    )
    return F.zip_with(
        ab,
        c,
        lambda p, z: F.struct(
            F.concat_ws(" ", p.getField("w1"), p.getField("w2")).alias(
                "ctx"
            ),
            F.concat_ws(
                " ", p.getField("w1"), p.getField("w2"), z
            ).alias("tg"),
            F.concat_ws(" ", p.getField("w2"), z).alias("b23"),
            p.getField("w2").alias("w2"),
            z.alias("w3"),
        ),
    )


def trigram_backoff_surprise(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
) -> DataFrame:
    """Held-out trigram LM surprise with STUPID BACKOFF (Brants et
    al. 2007, "Large Language Models in Machine Translation"): score
    each document of ``score`` under an n-gram model counted from
    ``train``:

        S(w3|w1 w2) = c3(w1 w2 w3)/c2(w1 w2)          if c3 > 0
                    = α · c2(w2 w3)/c1(w2)            elif c2(w2 w3) > 0
                    = α² · c1(w3)/N                   elif c1(w3) > 0
                    = α² · 1/N                        (OOV floor)

    Unlike :func:`bigram_surprise` (corpus scored under itself — every
    transition seen), the train/score split exercises all four branches,
    which is the real KenLM-filter deployment shape: count the model on
    a reference corpus, score candidate documents against it. Output:
    (id, n_trigrams, avg_neg_logp3) for scored docs with ≥ 3 tokens.

    Scale shape: three count tables are vocabulary-bounded (Zipf-small
    relative to the corpus; the trigram table is the big one — it
    map-side combines and joins back on its own key, never wider than
    the scored trigram stream). Five hash joins on n-gram string keys,
    one per-doc reduction; no UDFs, no windows, fully codegen.

    Float determinism: ln is r6-rounded at the moment of computation;
    the branch arithmetic (α multiplies, count ratios) is
    identical-order IEEE both engines; per-doc sums are exact scaled
    longs (`_dsum6`).
    """
    lo = F.lower(F.col(text_col))
    tri_train = train.select(
        F.explode(_trigram_parts(lo)).alias("t")
    ).select("t.*")
    tri_score = score.select(
        F.col(id_col), F.explode(_trigram_parts(lo)).alias("t")
    ).select(id_col, "t.*")

    c3 = tri_train.groupBy("tg").agg(F.count(F.lit(1)).alias("__c3"))
    bg = train.select(F.explode(_bigrams(lo)).alias("__bg"))
    c2 = bg.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c2"))
    toks = tokenize(train, id_col, text_col).select("token")
    c1 = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__c1"))
    total = toks.select(F.count(F.lit(1)).alias("__n"))

    j = (
        tri_score.join(c3, "tg", "left")
        .join(
            c2.select(
                F.col("__bg").alias("ctx"), F.col("__c2").alias("__cctx")
            ),
            "ctx",
            "left",
        )
        .join(
            c2.select(
                F.col("__bg").alias("b23"), F.col("__c2").alias("__cb23")
            ),
            "b23",
            "left",
        )
        .join(
            c1.select(
                F.col("token").alias("w2"), F.col("__c1").alias("__cw2")
            ),
            "w2",
            "left",
        )
        .join(
            c1.select(
                F.col("token").alias("w3"), F.col("__c1").alias("__cw3")
            ),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(total))
    )
    a1 = F.lit(float(alpha))
    a2 = F.lit(float(alpha) * float(alpha))
    nd = F.col("__n").cast("double")
    p = (
        F.when(
            F.col("__c3").isNotNull(),
            F.col("__c3").cast("double") / F.col("__cctx").cast("double"),
        )
        .when(
            F.col("__cb23").isNotNull(),
            a1 * F.col("__cb23").cast("double")
            / F.col("__cw2").cast("double"),
        )
        .when(
            F.col("__cw3").isNotNull(),
            a2 * F.col("__cw3").cast("double") / nd,
        )
        .otherwise(a2 / nd)
    )
    s = _r6(-F.log(p))
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            _dsum6(s).alias("__s"),
        )
        .withColumn(
            "avg_neg_logp3", _r6(F.col("__s") / F.col("n_trigrams"))
        )
        .drop("__s")
    )
