"""Table-driven per-transformation golden tests — the port of the
reference's ``TransformationTestDefinition`` harness
(``aligned/schemas/transformation.py:31-60``, driven for every
registered transformation by
``aligned/tests/test_transformations.py:17-30``).

Each case: an Expr over a tiny input frame and the expected column
values. One Spark job per batch (cases sharing an input frame are
evaluated in a single select), so the suite stays fast."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from aligned_spark import expr as E

TS = dt.datetime(2024, 3, 15, 14, 30, 45, 123456)  # Friday


def C(name):
    return E.Col(name)


def L(v):
    return E.Lit(v)


# (case_name, expr, expected list) over the shared numeric frame:
# rows: a=[6.0, -2.5, None], b=[4.0, 0.5, 2.0], i=[7, -3, 0], s=["Hello World", "abc", ""]
NUMERIC_CASES = [
    ("add", C("a") + C("b"), [10.0, -2.0, None]),
    ("sub", C("a") - C("b"), [2.0, -3.0, None]),
    ("mul", C("a") * C("b"), [24.0, -1.25, None]),
    ("div", C("a") / C("b"), [1.5, -5.0, None]),
    ("mod", E.Binary("mod", C("i"), L(4)), [3, -3, 0]),
    ("pow", E.Binary("pow", C("b"), L(2.0)), [16.0, 0.25, 4.0]),
    ("floor_div", E.Binary("floor_div", C("i"), L(2)), [3, -2, 0]),
    ("eq", C("b") == 4.0, [True, False, False]),
    ("neq", C("b") != 4.0, [False, True, True]),
    ("gt", C("b") > 1.0, [True, False, True]),
    ("gte", C("b") >= 2.0, [True, False, True]),
    ("lt", C("b") < 2.0, [False, True, False]),
    ("lte", C("b") <= 0.5, [False, True, False]),
    ("and", (C("b") > 1.0) & (C("i") > 0), [True, False, False]),
    ("or", (C("b") > 1.0) | (C("i") > 0), [True, False, True]),
    ("xor", (C("b") > 1.0) ^ (C("i") > 0), [False, False, True]),
    ("not", ~(C("b") > 1.0), [False, True, False]),
    # least/greatest skip nulls (same as Polars min_/max_horizontal)
    ("min2", E.Binary("min", C("a"), C("b")), [4.0, -2.5, 2.0]),
    ("max2", E.Binary("max", C("a"), C("b")), [6.0, 0.5, 2.0]),
    ("isin", E.Binary("isin", C("i"), L([0, 7])), [True, False, True]),
    ("is_null", E.Unary("is_null", C("a")), [False, False, True]),
    ("is_not_null", E.Unary("is_not_null", C("a")), [True, True, False]),
    ("abs", E.Unary("abs", C("a")), [6.0, 2.5, None]),
    ("floor", E.Unary("floor", C("b")), [4, 0, 2]),
    ("ceil", E.Unary("ceil", C("b")), [4, 1, 2]),
    ("round", E.Unary("round", C("b")), [4.0, 1.0, 2.0]),
    ("sqrt", E.Unary("sqrt", C("b")), [2.0, math.sqrt(0.5), math.sqrt(2.0)]),
    ("exp", E.Unary("exp", L(0.0)), [1.0, 1.0, 1.0]),
    ("log10", E.Unary("log10", L(100.0)), [2.0, 2.0, 2.0]),
    ("log1p", E.Unary("log1p", L(0.0)), [0.0, 0.0, 0.0]),
    ("sign", E.Unary("sign", C("a")), [1.0, -1.0, None]),
    ("sin0", E.Unary("sin", L(0.0)), [0.0, 0.0, 0.0]),
    ("cos0", E.Unary("cos", L(0.0)), [1.0, 1.0, 1.0]),
    (
        "arcsinh",
        E.Unary("arcsinh", L(1.0)),
        [math.asinh(1.0)] * 3,
    ),
    (
        "arccosh",
        E.Unary("arccosh", L(2.0)),
        [math.acosh(2.0)] * 3,
    ),
    (
        "arctanh",
        E.Unary("arctanh", L(0.5)),
        [math.atanh(0.5)] * 3,
    ),
    ("degrees", E.Unary("degrees", L(math.pi)), [180.0] * 3),
    ("radians", E.Unary("radians", L(180.0)), [math.pi] * 3),
    ("to_num", E.ToNumerical(L("3.5")), [3.5] * 3),
    ("to_num_bad", E.ToNumerical(L("abc")), [None] * 3),
    ("fill_na", E.FillNa(C("a"), L(-1.0)), [6.0, -2.5, -1.0]),
    ("copy", E.Copy(C("i")), [7, -3, 0]),
    ("is_between", E.IsBetween(C("b"), L(0.4), L(2.0)), [False, True, True]),
    ("clip", E.Clip(C("b"), 1.0, 3.0), [3.0, 1.0, 2.0]),
    ("log_base", E.LogBase(L(8.0), 2.0), [3.0] * 3),
    ("cast_int", E.Cast(C("b"), "int32"), [4, 0, 2]),
    (
        "hash_stable",
        E.HashColumns(["i"]) == E.HashColumns(["i"]),
        [True, True, True],
    ),
    (
        "euclid",
        E.EuclideanDistance(L(3.0), L(4.0), L(0.0), L(0.0)),
        [5.0] * 3,
    ),
]

STRING_CASES = [
    ("upper", E.Unary("str_to_upper", C("s")), ["HELLO WORLD", "ABC", ""]),
    ("lower", E.Unary("str_to_lower", C("s")), ["hello world", "abc", ""]),
    ("len", E.Unary("str_len_char", C("s")), [11, 3, 0]),
    (
        "contains",
        E.Binary("str_contains", C("s"), L("World")),
        [True, False, False],
    ),
    (
        "starts",
        E.Binary("str_starts_with", C("s"), L("He")),
        [True, False, False],
    ),
    (
        "ends",
        E.Binary("str_ends_with", C("s"), L("c")),
        [False, True, False],
    ),
    # 0-based find; -1 when absent (reference `str_find` semantics,
    # transformation.py:640-646)
    ("find", E.Binary("str_find", C("s"), L("o")), [4, -1, -1]),
    (
        "concat_op",
        E.Binary("concat", C("s"), L("!")),
        ["Hello World!", "abc!", "!"],
    ),
    (
        "append_const",
        E.AppendConstString(C("s"), "?"),
        ["Hello World?", "abc?", "?"],
    ),
    (
        "prepend_const",
        E.PrependConstString(">", C("s")),
        [">Hello World", ">abc", ">"],
    ),
    (
        "concat_ws",
        E.ConcatStrings([C("s"), C("s")], separator="|"),
        ["Hello World|Hello World", "abc|abc", "|"],
    ),
    (
        "split_at",
        E.ArrayAtIndex(E.Binary("str_split", C("s"), L(" ")), 1),
        ["World", None, None],
    ),
    (
        "replace",
        E.ReplaceStrings(C("s"), [("l+", "L")]),
        ["HeLo WorLd", "abc", ""],
    ),
    (
        "ordinal",
        E.Ordinal(C("s"), ["abc", "Hello World"]),
        [1, 0, None],
    ),
    (
        "format",
        E.FormatString("<%s>", [C("s")]),
        ["<Hello World>", "<abc>", "<>"],
    ),
]

DATE_CASES = [
    ("year", E.DateComponent(C("ts"), "year"), 2024),
    ("month", E.DateComponent(C("ts"), "month"), 3),
    ("day", E.DateComponent(C("ts"), "day"), 15),
    ("hour", E.DateComponent(C("ts"), "hour"), 14),
    ("minute", E.DateComponent(C("ts"), "minute"), 30),
    ("second", E.DateComponent(C("ts"), "second"), 45),
    ("quarter", E.DateComponent(C("ts"), "quarter"), 1),
    ("weekday_mon1", E.DateComponent(C("ts"), "weekday"), 5),  # Friday
    ("dayofweek_sun1", E.DateComponent(C("ts"), "dayofweek"), 6),
    ("ordinal_day", E.DateComponent(C("ts"), "ordinal_day"), 75),
    ("microsecond", E.DateComponent(C("ts"), "microsecond"), 123456),
]


@pytest.fixture(scope="module")
def frames(spark):
    num = spark.createDataFrame(
        [
            (6.0, 4.0, 7, "Hello World"),
            (-2.5, 0.5, -3, "abc"),
            (None, 2.0, 0, ""),
        ],
        "a double, b double, i int, s string",
    )
    ts = spark.createDataFrame([(TS,)], "ts timestamp")
    return num, ts


def _run_cases(df, cases):
    out = df.select(
        *[e.to_spark().alias(name) for name, e, _ in cases]
    ).collect()
    for name, _, expected in cases:
        got = [row[name] for row in out]
        for g, want in zip(got, expected if isinstance(expected, list) else [expected] * len(out)):
            if isinstance(want, float) and g is not None:
                assert g == pytest.approx(want, rel=1e-12), (name, got, expected)
            else:
                assert g == want, (name, got, expected)


def test_numeric_transformations(frames):
    num, _ = frames
    _run_cases(num, NUMERIC_CASES)


def test_string_transformations(frames):
    num, _ = frames
    _run_cases(num, STRING_CASES)


def test_date_transformations(frames):
    _, ts = frames
    _run_cases(ts, DATE_CASES)


def test_structured_transformations(spark):
    df = spark.createDataFrame(
        [('{"k": 1, "s": "x"}', [1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "j string, va array<double>, vb array<double>",
    )
    cases = [
        ("json_path", E.JsonPath(C("j"), "$.k"), ["1"]),
        (
            "struct_field_json",
            E.StructField_(C("j"), "s", from_json_string=True),
            ["x"],
        ),
        ("array_at", E.ArrayAtIndex(C("va"), 2), [3.0]),
        ("array_at_neg", E.ArrayAtIndex(C("va"), -1), [3.0]),
        (
            "array_contains",
            E.ArrayContains(C("va"), L(2.0)),
            [True],
        ),
        (
            "array_contains_any",
            E.ArrayContainsAny(C("va"), [9.0, 3.0]),
            [True],
        ),
        ("dot", E.ListDotProduct(C("va"), C("vb")), [32.0]),
        (
            "time_diff_s",
            E.TimeDiff(L(dt.datetime(2024, 1, 2)), L(dt.datetime(2024, 1, 1))),
            [86400.0],
        ),
    ]
    _run_cases(df, cases)


def test_map_arg_max(spark):
    df = spark.createDataFrame(
        [(0.2, 0.7, 0.1), (0.8, 0.1, 0.1)], "pa double, pb double, pc double"
    )
    e = E.MapArgMax({"pa": "A", "pb": "B", "pc": "C"})
    got = [r.out for r in df.select(e.to_spark().alias("out")).collect()]
    assert got == ["B", "A"]


def test_expr_serialization_roundtrip():
    """to_dict/from_dict roundtrip — every case in the table must
    survive serialization (the contract store persists expressions)."""
    for name, e, _ in NUMERIC_CASES + STRING_CASES:
        if not isinstance(e, E.Expr):
            continue
        d = e.to_dict()
        back = E.expr_from_dict(d)
        assert back.to_dict() == d, name
