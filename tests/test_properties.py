"""Property-based tests (hypothesis) for the PIT core.

The reference pins PIT semantics with one hand-computed fixture
(``conftest.py:726-847``, ported in test_operators). These properties
check the same semantics against a Python brute force over RANDOM
entity/timestamp layouts — duplicate timestamps, empty entities,
facts before any feature, TTL edges — the shapes a fixture never
covers.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = dt.datetime(2024, 1, 1)


def _ts(sec: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


feature_rows = st.lists(
    st.tuples(
        st.integers(0, 3),          # entity
        st.integers(0, 100),        # ts offset seconds (dups allowed)
        st.integers(-50, 50),       # value
    ),
    min_size=0,
    max_size=25,
)
fact_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feats=feature_rows, facts=fact_rows, ttl=st.sampled_from([None, 30]))
def test_pit_join_matches_brute_force(spark, feats, facts, ttl):
    from aligned_spark.operators.joins import pit_join

    # deterministic winner under ts ties: keep ONE row per (entity, ts)
    dedup = {}
    for e, t, v in feats:
        dedup[(e, t)] = v
    feats = [(e, t, v) for (e, t), v in dedup.items()]

    fdf = spark.createDataFrame(
        [(e, _ts(t), v) for e, t, v in feats] or [(None, None, None)],
        "entity long, ts timestamp, value long",
    )
    if not feats:
        fdf = fdf.filter("entity IS NOT NULL")
    qdf = spark.createDataFrame(
        [(i, e, _ts(t)) for i, (e, t) in enumerate(facts)],
        "row_id long, entity long, event_timestamp timestamp",
    )
    out = pit_join(
        qdf,
        fdf,
        entities=["entity"],
        feature_ts="ts",
        fact_ts="event_timestamp",
        ttl_seconds=ttl,
        feature_columns=["value"],
    )
    got = {r.row_id: r.value for r in out.collect()}

    for i, (e, t) in enumerate(facts):
        cands = [
            (ft, v)
            for fe, ft, v in feats
            if fe == e
            and ft <= t
            and (ttl is None or ft >= t - ttl)
        ]
        expected = max(cands)[1] if cands else None
        assert got.get(i) == expected, (i, e, t, cands, got.get(i))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feats=feature_rows, window=st.sampled_from([10, 40]))
def test_rolling_sum_matches_brute_force(spark, feats, window):
    from aligned_spark.operators.aggregate import AggSpec, rolling_aggregate

    if not feats:
        return
    df = spark.createDataFrame(
        [(e, _ts(t), v) for e, t, v in feats],
        "entity long, ts timestamp, value long",
    )
    out = rolling_aggregate(
        df,
        keys=["entity"],
        ts="ts",
        window_seconds=window,
        aggs=[AggSpec("s", "sum", "value")],
    )
    got = [(r.entity, r.ts, r.s) for r in out.collect()]
    # one output row per input row; value = sum over [ts-w, ts]
    assert len(got) == len(feats)
    for e, t_out, s in got:
        t = int((t_out - BASE).total_seconds())
        expected = sum(
            v for fe, ft, v in feats if fe == e and t - window <= ft <= t
        )
        assert s == expected, (e, t, s, expected)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    feats=feature_rows,
    facts=fact_rows,
    ttl=st.sampled_from([None, 30]),
    bucket=st.sampled_from([7, 50, 1000]),
)
def test_bucketed_asof_matches_plain_property(spark, feats, facts, ttl, bucket):
    """Segmented-scan as-of ≡ plain as-of on random layouts: dup
    timestamps, empty entities, facts before any feature, TTL edges,
    bucket widths from smaller-than-gaps to wider-than-history."""
    from aligned_spark.operators.joins import pit_join

    feat_df = spark.createDataFrame(
        [(e, _ts(t), float(v)) for e, t, v in feats],
        "user_id long, ts timestamp, value double",
    )
    fact_df = spark.createDataFrame(
        [(e, _ts(t)) for e, t in facts],
        "user_id long, fts timestamp",
    )
    kw = dict(
        entities=["user_id"], feature_ts="ts", fact_ts="fts",
        ttl_seconds=ttl, feature_columns=["value"],
    )
    plain = sorted(map(tuple, pit_join(fact_df, feat_df, **kw).collect()))
    buck = sorted(map(tuple, pit_join(
        fact_df, feat_df, bucket_seconds=float(bucket), **kw
    ).collect()))
    assert plain == buck


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 99), st.integers(0, 500)),  # (arrival, ts)
        min_size=1, max_size=40, unique_by=lambda r: r[0],
    ),
    delay=st.sampled_from([0, 25, 100]),
    batch=st.sampled_from([1, 7, 16]),
)
def test_drop_late_events_matches_reference(spark, rows, delay, batch):
    """drop_late_events ≡ a sequential replay of Spark's watermark
    rule in plain Python."""
    from aligned_spark.streaming import drop_late_events

    df = spark.createDataFrame(
        [(a, _ts(t)) for a, t in rows], "arr long, ts timestamp"
    )
    got = sorted(
        (r.arr, r.ts)
        for r in drop_late_events(
            df, "ts", delay_seconds=delay, arrival_col="arr",
            batch_size=batch,
        ).collect()
    )

    # reference: walk batches in arrival order, watermark = running
    # max of COMPLETED batches minus delay
    from collections import defaultdict

    batches = defaultdict(list)
    for a, t in rows:
        batches[a // batch].append((a, _ts(t)))
    wm = None
    running_max = None
    kept = []
    for b in sorted(batches):
        for a, t in batches[b]:
            if wm is None or t >= wm:
                kept.append((a, t))
        bmax = max(t for _, t in batches[b])
        running_max = bmax if running_max is None else max(running_max, bmax)
        wm = running_max - dt.timedelta(seconds=delay)
    assert got == sorted(kept)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    feats=feature_rows,
    facts=fact_rows,
    ttl=st.sampled_from([None, 30]),
    direction=st.sampled_from(["forward", "nearest"]),
    bucket=st.sampled_from([None, 7.0, 1000.0]),
)
def test_asof_directions_match_brute_force(
    spark, feats, facts, ttl, direction, bucket
):
    """forward/nearest as-of vs a Python brute force over random
    layouts — dup timestamps, facts outside the feature range, TTL
    cuts, ties resolved backward for nearest."""
    from aligned_spark.operators.joins import asof_join

    feat_df = spark.createDataFrame(
        [(e, _ts(t), float(v)) for e, t, v in feats],
        "user_id long, ts timestamp, value double",
    )
    fact_df = spark.createDataFrame(
        [(i, e, _ts(t)) for i, (e, t) in enumerate(facts)],
        "fid long, user_id long, ts timestamp",
    )
    got = {
        r.fid: r.value
        for r in asof_join(
            fact_df, feat_df, on="ts", by=["user_id"],
            tolerance_seconds=ttl, direction=direction,
            bucket_seconds=bucket,
        ).collect()
    }

    def brute(e, t):
        # all arithmetic in integer second offsets
        cand = [(ft, float(v)) for fe, ft, v in feats if fe == e]
        if direction == "forward":
            ok = [(ft, v) for ft, v in cand
                  if ft >= t and (ttl is None or ft - t <= ttl)]
            if not ok:
                return None
            m = min(ft for ft, _ in ok)
            # duplicate-ts features make the pick ambiguous — accept
            # any value at the winning timestamp
            return {v for ft, v in ok if ft == m}
        back = [(t - ft, v) for ft, v in cand
                if ft <= t and (ttl is None or t - ft <= ttl)]
        fwd = [(ft - t, v) for ft, v in cand
               if ft >= t and (ttl is None or ft - t <= ttl)]
        bd = min((d for d, _ in back), default=None)
        fd = min((d for d, _ in fwd), default=None)
        if bd is None and fd is None:
            return None
        if fd is None or (bd is not None and bd <= fd):
            return {v for d, v in back if d == bd}
        return {v for d, v in fwd if d == fd}

    for i, (e, t) in enumerate(facts):
        want = brute(e, t)
        if want is None:
            assert got[i] is None, (i, got[i])
        else:
            assert got[i] in want, (i, got[i], want)


# --- substring-span dedup vs python brute force ---------------------

span_docs = st.lists(
    st.lists(st.sampled_from(list("abcdefgh")), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=span_docs, width=st.sampled_from([2, 3]))
def test_duplicate_spans_matches_brute_force(spark, docs, width):
    """Random tiny corpora (single-letter tokens, heavy repetition —
    exactly the tie/overlap shapes a fixture never covers) against a
    direct python reimplementation of census + islands."""
    from aligned_spark.operators.dedup import duplicate_spans

    texts = [" ".join(toks) for toks in docs]
    windows = {
        i: [tuple(toks[j : j + width]) for j in range(len(toks) - width + 1)]
        for i, toks in enumerate(docs)
    }
    from collections import Counter

    owner: dict[tuple, set] = {}
    for i, ws in windows.items():
        for w in ws:
            owner.setdefault(w, set()).add(i)
    expected = {}
    for i, ws in windows.items():
        dup_flags = [len(owner[w]) >= 2 for w in ws]
        dup_windows = sum(dup_flags)
        best = cur = 0
        for f in dup_flags:
            cur = cur + 1 if f else 0
            best = max(best, cur)
        expected[i] = (len(ws), dup_windows, best)

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.total_windows, r.dup_windows, r.max_dup_run)
        for r in duplicate_spans(
            df, "doc_id", "text", width=width, impl="poly"
        ).collect()
    }
    assert got == expected


# --- blocked fuzzy join vs python brute force ------------------------

fuzzy_names = st.lists(
    st.text(alphabet="abcx", min_size=0, max_size=6),
    min_size=1,
    max_size=10,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=fuzzy_names, k=st.sampled_from([1, 2]), blk=st.sampled_from([1, 2]))
def test_fuzzy_join_matches_brute_force(spark, names, k, blk):
    """Blocking contract exactly: pairs share the lowercased
    ``blk``-char prefix AND edit distance <= k (tiny alphabet forces
    prefix collisions, empty strings, and distance ties)."""
    from aligned_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        list(enumerate(names)), "lid long, lname string"
    )
    right = spark.createDataFrame(
        list(enumerate(names)), "rid long, rname string"
    )
    expected = set()
    for i, a in enumerate(names):
        for j, b in enumerate(names):
            if a[:blk] == b[:blk] and _lev(a, b) <= k:
                expected.add((i, j, _lev(a, b)))
    got = {
        (r.lid, r.rid, r.edit_distance)
        for r in fuzzy_join(
            left, right, "lname", "rname", max_distance=k, block_len=blk
        ).collect()
    }
    assert got == expected
