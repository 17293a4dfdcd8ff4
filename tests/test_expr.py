"""Per-transformation golden tests.

Mirrors the reference's table-driven harness
(``TransformationTestDefinition``, ``aligned/schemas/transformation.py:31-60``;
runner ``transformation.py:210-281``): input columns → expected output
column, executed through spark.createDataFrame + the IR lowering.
"""

import math

import pytest
from pyspark.sql import functions as F

from aligned_spark import expr as E


def run_case(spark, rows, expression, expected, schema=None):
    df = spark.createDataFrame(rows, schema=schema)
    out = df.withColumn("__out", expression.to_spark())
    got = [r["__out"] for r in out.select("__out").collect()]
    assert len(got) == len(expected)
    for g, want in zip(got, expected):
        if isinstance(want, float) and g is not None:
            if math.isnan(want):
                assert math.isnan(g)
            else:
                assert g == pytest.approx(want, rel=1e-9), (g, want)
        else:
            assert g == want, (g, want)


def test_binary_arithmetic(spark):
    rows = [{"a": 10.0, "b": 3.0}, {"a": -7.0, "b": 2.0}]
    run_case(spark, rows, E.Col("a") + E.Col("b"), [13.0, -5.0])
    run_case(spark, rows, E.Col("a") - E.Col("b"), [7.0, -9.0])
    run_case(spark, rows, E.Col("a") * E.Col("b"), [30.0, -14.0])
    run_case(spark, rows, E.Col("a") / E.Col("b"), [10 / 3, -3.5])
    run_case(spark, rows, E.Col("a") % E.Col("b"), [1.0, -1.0])
    run_case(spark, rows, E.Col("a") ** E.Col("b"), [1000.0, 49.0])


def test_floor_div_follows_polars_not_truncation(spark):
    # -7 // 2 = -4 (floor), not -3 (truncation) — SURVEY §2.3 trap
    rows = [{"a": 7, "b": 2}, {"a": -7, "b": 2}]
    run_case(spark, rows, E.Col("a") // E.Col("b"), [3, -4])


def test_binary_comparisons(spark):
    rows = [{"a": 1, "b": 2}, {"a": 2, "b": 2}, {"a": 3, "b": 2}]
    run_case(spark, rows, E.Col("a") > E.Col("b"), [False, False, True])
    run_case(spark, rows, E.Col("a") >= E.Col("b"), [False, True, True])
    run_case(spark, rows, E.Col("a") < E.Col("b"), [True, False, False])
    run_case(spark, rows, E.Binary("eq", E.Col("a"), E.Col("b")), [False, True, False])
    run_case(spark, rows, E.Binary("neq", E.Col("a"), E.Col("b")), [True, False, True])


def test_binary_min_max_concat(spark):
    rows = [{"a": 1.0, "b": 2.0}]
    run_case(spark, rows, E.Binary("min", E.Col("a"), E.Col("b")), [1.0])
    run_case(spark, rows, E.Binary("max", E.Col("a"), E.Col("b")), [2.0])
    rows2 = [{"a": "x", "b": "y"}]
    run_case(spark, rows2, E.Binary("concat", E.Col("a"), E.Col("b")), ["xy"])


def test_logical_ops(spark):
    rows = [
        {"a": True, "b": True},
        {"a": True, "b": False},
        {"a": False, "b": False},
    ]
    run_case(spark, rows, E.Col("a") & E.Col("b"), [True, False, False])
    run_case(spark, rows, E.Col("a") | E.Col("b"), [True, True, False])
    run_case(spark, rows, E.Col("a") ^ E.Col("b"), [False, True, False])
    run_case(spark, rows, ~E.Col("a"), [False, False, True])


def test_string_binary_ops(spark):
    rows = [{"s": "hello world"}, {"s": "spark"}]
    run_case(
        spark, rows, E.Binary("str_contains", E.Col("s"), E.Lit("world")), [True, False]
    )
    run_case(
        spark, rows, E.Binary("str_starts_with", E.Col("s"), E.Lit("he")), [True, False]
    )
    run_case(
        spark, rows, E.Binary("str_ends_with", E.Col("s"), E.Lit("rk")), [False, True]
    )
    # 0-based find, -1 when absent
    run_case(spark, rows, E.Binary("str_find", E.Col("s"), E.Lit("o")), [4, -1])


def test_str_split(spark):
    rows = [{"s": "a.b.c"}]
    run_case(
        spark,
        rows,
        E.Binary("str_split", E.Col("s"), E.Lit(".")),
        [["a", "b", "c"]],
    )


def test_isin(spark):
    rows = [{"x": "a"}, {"x": "z"}]
    run_case(spark, rows, E.Binary("isin", E.Col("x"), E.Lit(["a", "b"])), [True, False])


def test_unary_math(spark):
    rows = [{"x": 4.0}, {"x": 0.25}]
    run_case(spark, rows, E.Unary("sqrt", E.Col("x")), [2.0, 0.5])
    run_case(spark, rows, E.Unary("log", E.Col("x")), [math.log(4), math.log(0.25)])
    run_case(spark, rows, E.Unary("exp", E.Col("x")), [math.exp(4), math.exp(0.25)])
    run_case(spark, rows, E.Unary("abs", E.Lit(-3.0)), [3.0, 3.0])
    run_case(spark, rows, E.Unary("floor", E.Col("x")), [4, 0])
    run_case(spark, rows, E.Unary("ceil", E.Col("x")), [4, 1])
    run_case(spark, rows, E.Unary("sign", E.Lit(-5.0)), [-1.0, -1.0])


def test_unary_trig_and_inverse_hyperbolic(spark):
    rows = [{"x": 0.5}]
    run_case(spark, rows, E.Unary("sin", E.Col("x")), [math.sin(0.5)])
    run_case(spark, rows, E.Unary("arcsin", E.Col("x")), [math.asin(0.5)])
    run_case(spark, rows, E.Unary("arcsinh", E.Col("x")), [math.asinh(0.5)])
    run_case(spark, rows, E.Unary("arctanh", E.Col("x")), [math.atanh(0.5)])
    run_case(spark, rows, E.Unary("cot", E.Col("x")), [math.cos(0.5) / math.sin(0.5)])
    run_case(spark, rows, E.Unary("degrees", E.Lit(math.pi)), [180.0])
    rows2 = [{"x": 2.0}]
    run_case(spark, rows2, E.Unary("arccosh", E.Col("x")), [math.acosh(2.0)])


def test_null_checks(spark):
    rows = [{"x": 1.0}, {"x": None}]
    schema = "x double"
    run_case(spark, rows, E.Unary("is_null", E.Col("x")), [False, True], schema)
    run_case(spark, rows, E.Unary("is_not_null", E.Col("x")), [True, False], schema)
    nan_rows = [{"x": float("nan")}, {"x": 1.0}]
    run_case(spark, nan_rows, E.Unary("is_nan", E.Col("x")), [True, False], schema)
    inf_rows = [{"x": float("inf")}, {"x": 1.0}]
    run_case(spark, inf_rows, E.Unary("is_infinite", E.Col("x")), [True, False], schema)
    run_case(spark, inf_rows, E.Unary("is_finite", E.Col("x")), [False, True], schema)


def test_string_case_and_length(spark):
    rows = [{"s": "MiXeD"}]
    run_case(spark, rows, E.Unary("str_to_lower", E.Col("s")), ["mixed"])
    run_case(spark, rows, E.Unary("str_to_upper", E.Col("s")), ["MIXED"])
    run_case(spark, rows, E.Unary("str_len_char", E.Col("s")), [5])


def test_date_components(spark):
    import datetime as dt

    rows = [{"ts": dt.datetime(2024, 3, 4, 15, 30, 45)}]  # a Monday
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "year"), [2024])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "month"), [3])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "day"), [4])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "hour"), [15])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "minute"), [30])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "second"), [45])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "quarter"), [1])
    # Polars convention: Monday = 1
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "weekday"), [1])
    sunday = [{"ts": dt.datetime(2024, 3, 10)}]
    run_case(spark, sunday, E.DateComponent(E.Col("ts"), "weekday"), [7])
    run_case(spark, rows, E.DateComponent(E.Col("ts"), "ordinal_day"), [64])


def test_time_diff(spark):
    import datetime as dt

    rows = [
        {
            "a": dt.datetime(2024, 1, 1, 0, 1, 30),
            "b": dt.datetime(2024, 1, 1, 0, 0, 0),
        }
    ]
    run_case(spark, rows, E.TimeDiff(E.Col("a"), E.Col("b")), [90.0])
    run_case(spark, rows, E.TimeDiff(E.Col("a"), E.Col("b"), unit="m"), [1.5])


def test_to_numerical(spark):
    rows = [{"s": "1.5"}, {"s": "abc"}]
    run_case(spark, rows, E.ToNumerical(E.Col("s")), [1.5, None])


def test_array_ops(spark):
    rows = [{"xs": [1, 2, 3]}]
    run_case(spark, rows, E.ArrayAtIndex(E.Col("xs"), 0), [1])
    run_case(spark, rows, E.ArrayAtIndex(E.Col("xs"), 2), [3])
    run_case(spark, rows, E.ArrayContains(E.Col("xs"), E.Lit(2)), [True])
    run_case(spark, rows, E.ArrayContains(E.Col("xs"), E.Lit(9)), [False])
    run_case(spark, rows, E.ArrayContainsAny(E.Col("xs"), [9, 3]), [True])
    run_case(spark, rows, E.ArrayContainsAny(E.Col("xs"), [9, 8]), [False])


def test_ordinal(spark):
    rows = [{"c": "low"}, {"c": "high"}, {"c": "unknown"}]
    expr = E.Ordinal(E.Col("c"), ["low", "mid", "high"])
    run_case(spark, rows, expr, [0, 2, None])


def test_replace_strings(spark):
    rows = [{"s": "a-b_c"}]
    run_case(
        spark,
        rows,
        E.ReplaceStrings(E.Col("s"), [("-", "+"), ("_", "+")]),
        ["a+b+c"],
    )


def test_fill_na(spark):
    rows = [{"x": None, "y": 9.0}, {"x": 1.0, "y": 2.0}]
    schema = "x double, y double"
    run_case(spark, rows, E.FillNa(E.Col("x"), E.Lit(0.0)), [0.0, 1.0], schema)
    run_case(spark, rows, E.FillNa(E.Col("x"), E.Col("y")), [9.0, 1.0], schema)


def test_map_arg_max(spark):
    rows = [{"p_a": 0.2, "p_b": 0.7, "p_c": 0.1}]
    expr = E.MapArgMax([("p_a", "a"), ("p_b", "b"), ("p_c", "c")])
    run_case(spark, rows, expr, ["b"])
    # single column thresholds at 0.5
    single = E.MapArgMax([("p_a", "a")])
    run_case(spark, [{"p_a": 0.6}], single, ["a"])
    run_case(spark, [{"p_a": 0.4}], single, [None])


def test_string_concat_transforms(spark):
    rows = [{"s": "x", "t": "y"}]
    run_case(spark, rows, E.AppendConstString(E.Col("s"), "!"), ["x!"])
    run_case(spark, rows, E.PrependConstString(">", E.Col("s")), [">x"])
    run_case(
        spark,
        rows,
        E.ConcatStrings([E.Col("s"), E.Col("t")], separator="-"),
        ["x-y"],
    )


def test_json_access(spark):
    rows = [{"j": '{"a": {"b": 2}, "c": "v"}'}]
    run_case(spark, rows, E.JsonPath(E.Col("j"), "$.a.b"), ["2"])
    run_case(
        spark, rows, E.StructField_(E.Col("j"), "c", from_json_string=True), ["v"]
    )


def test_struct_field(spark):
    rows = [{"s": {"a": 1, "b": 2}}]
    run_case(spark, rows, E.StructField_(E.Col("s"), "b"), [2])


def test_is_between_clip_cast_log(spark):
    rows = [{"x": 5.0}, {"x": 15.0}]
    run_case(
        spark, rows, E.IsBetween(E.Col("x"), E.Lit(0.0), E.Lit(10.0)), [True, False]
    )
    run_case(spark, rows, E.Clip(E.Col("x"), 0.0, 10.0), [5.0, 10.0])
    run_case(spark, rows, E.Cast(E.Col("x"), "int32"), [5, 15])
    run_case(spark, rows, E.LogBase(E.Lit(8.0), 2.0), [3.0, 3.0])


def test_format_string(spark):
    rows = [{"a": "x", "n": 3}]
    run_case(spark, rows, E.FormatString("%s-%d", [E.Col("a"), E.Col("n")]), ["x-3"])


def test_list_dot_product_and_cosine(spark):
    rows = [{"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]}]
    run_case(spark, rows, E.ListDotProduct(E.Col("a"), E.Col("b")), [32.0])
    expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    run_case(spark, rows, E.CosineSimilarity(E.Col("a"), E.Col("b")), [expected])


def test_hash_columns_stable(spark):
    rows = [{"a": "x", "b": 1}, {"a": "x", "b": 1}, {"a": "y", "b": 2}]
    df = spark.createDataFrame(rows)
    out = df.withColumn("h", E.HashColumns(["a", "b"]).to_spark())
    hashes = [r["h"] for r in out.collect()]
    assert hashes[0] == hashes[1]
    assert hashes[0] != hashes[2]


def test_euclidean_distance(spark):
    rows = [{"x1": 0.0, "y1": 0.0, "x2": 3.0, "y2": 4.0}]
    expr = E.EuclideanDistance(E.Col("x1"), E.Col("y1"), E.Col("x2"), E.Col("y2"))
    run_case(spark, rows, expr, [5.0])


def test_serialization_roundtrip(spark):
    exprs = [
        (E.Col("a") + E.Col("b")) * E.Lit(2),
        E.DateComponent(E.Col("ts"), "weekday"),
        E.Clip(E.Col("x"), 0.0, 1.0),
        E.Ordinal(E.Col("c"), ["a", "b"]),
        E.CosineSimilarity(E.Col("u"), E.Col("v")),
        E.Unary("arcsinh", E.Binary("div", E.Col("x"), E.Lit(2.0))),
    ]
    for expr in exprs:
        data = expr.to_dict()
        back = E.expr_from_dict(data)
        assert back.to_dict() == data
        assert back.references() == expr.references()


def test_references():
    e = (E.Col("a") + E.Col("b")) * E.Col("c")
    assert e.references() == {"a", "b", "c"}
    assert E.HashColumns(["x", "y"]).references() == {"x", "y"}
    assert E.MapArgMax([("p", "l")]).references() == {"p"}
