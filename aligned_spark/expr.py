"""Serializable expression IR with a single Spark ``Column`` lowering.

The reference's query IR is ``Expression`` = column-ref | literal |
nested ``Transformation`` (``aligned/schemas/transformation.py:356-447``)
with per-backend lowerings (``to_polars``/``to_spark``/``to_glot``).
This engine keeps the serializable IR (contracts must survive a
round-trip through JSON so they can live in a catalog) but has exactly
one lowering: :meth:`Expr.to_spark` → ``pyspark.sql.Column``.

Operator surface = the reference's ``SupportedTransformations``
registry (``transformation.py:284-353``): binary ops
(``transformation.py:450-477``), unary ops (``transformation.py:829-865``),
and the scalar/structural transforms catalogued in SURVEY.md §2.3.

Deliberate semantic fixes versus the reference's own Spark shim:

- ``floor_div`` uses ``F.floor(l / r)`` (Polars floordiv semantics);
  the reference's Spark path truncates (``transformation.py:617-619``).
- ``weekday`` is Polars convention Mon=1..Sun=7, mapped from Spark's
  ``dayofweek`` (Sun=1) via ``((dayofweek + 5) % 7) + 1``.
- ``str_find`` is 0-based with -1 for no-match (``F.locate`` is
  1-based with 0 for no-match; reference subtracts 1,
  ``transformation.py:640-646``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, ClassVar

from pyspark.sql import Column
from pyspark.sql import functions as F

from aligned_spark.types import FeatureType

# ---------------------------------------------------------------------------
# registry


_REGISTRY: dict[str, type["Expr"]] = {}


def register(cls: type["Expr"]) -> type["Expr"]:
    _REGISTRY[cls.kind] = cls
    return cls


def expr_from_dict(data: dict[str, Any]) -> "Expr":
    kind = data["kind"]
    cls = _REGISTRY.get(kind)
    if cls is None:
        raise ValueError(f"unknown expression kind {kind!r}")
    return cls._from_dict(data)


def _encode(value: Any) -> Any:
    if isinstance(value, Expr):
        return value.to_dict()
    if isinstance(value, (list, tuple)):
        return [_encode(v) for v in value]
    return value


def _decode(value: Any) -> Any:
    if isinstance(value, dict) and "kind" in value:
        return expr_from_dict(value)
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


class Expr:
    """Base IR node. Subclasses are dataclasses with a ``kind`` tag."""

    kind: ClassVar[str] = "expr"

    def to_spark(self) -> Column:
        raise NotImplementedError

    def references(self) -> set[str]:
        """Names of source columns this expression reads."""
        out: set[str] = set()
        for v in self.__dict__.values():
            if isinstance(v, Expr):
                out |= v.references()
            elif isinstance(v, (list, tuple)):
                for item in v:
                    if isinstance(item, Expr):
                        out |= item.references()
        return out

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {"kind": self.kind}
        for k, v in self.__dict__.items():
            out[k] = _encode(v)
        return out

    @classmethod
    def _from_dict(cls, data: dict[str, Any]) -> "Expr":
        kwargs = {k: _decode(v) for k, v in data.items() if k != "kind"}
        return cls(**kwargs)  # type: ignore[call-arg]

    # sugar so raw Exprs compose (the contract DSL in contracts.py is
    # the user-facing layer; this keeps the IR testable standalone)
    def _bin(self, op: str, other: Any, reverse: bool = False) -> "Binary":
        rhs = other if isinstance(other, Expr) else Lit(other)
        return Binary(op, rhs, self) if reverse else Binary(op, self, rhs)

    def __add__(self, o: Any) -> "Binary":
        return self._bin("add", o)

    def __radd__(self, o: Any) -> "Binary":
        return self._bin("add", o, True)

    def __sub__(self, o: Any) -> "Binary":
        return self._bin("sub", o)

    def __rsub__(self, o: Any) -> "Binary":
        return self._bin("sub", o, True)

    def __mul__(self, o: Any) -> "Binary":
        return self._bin("mul", o)

    def __rmul__(self, o: Any) -> "Binary":
        return self._bin("mul", o, True)

    def __truediv__(self, o: Any) -> "Binary":
        return self._bin("div", o)

    def __floordiv__(self, o: Any) -> "Binary":
        return self._bin("floor_div", o)

    def __mod__(self, o: Any) -> "Binary":
        return self._bin("mod", o)

    def __pow__(self, o: Any) -> "Binary":
        return self._bin("pow", o)

    def __and__(self, o: Any) -> "Binary":
        return self._bin("and", o)

    def __or__(self, o: Any) -> "Binary":
        return self._bin("or", o)

    def __xor__(self, o: Any) -> "Binary":
        return self._bin("xor", o)

    def __eq__(self, o: Any) -> "Binary":  # type: ignore[override]
        return self._bin("eq", o)

    def __ne__(self, o: Any) -> "Binary":  # type: ignore[override]
        return self._bin("neq", o)

    def __gt__(self, o: Any) -> "Binary":
        return self._bin("gt", o)

    def __ge__(self, o: Any) -> "Binary":
        return self._bin("gte", o)

    def __lt__(self, o: Any) -> "Binary":
        return self._bin("lt", o)

    def __le__(self, o: Any) -> "Binary":
        return self._bin("lte", o)

    def __invert__(self) -> "Unary":
        return Unary("not", self)

    def __hash__(self) -> int:
        return hash((self.kind, str(self.to_dict())))


@register
@dataclass(eq=False)
class Col(Expr):
    """Reference to a column by name."""

    kind: ClassVar[str] = "col"
    name: str

    def to_spark(self) -> Column:
        return F.col(self.name)

    def references(self) -> set[str]:
        return {self.name}


@register
@dataclass(eq=False)
class Lit(Expr):
    """Literal value."""

    kind: ClassVar[str] = "lit"
    value: Any

    def to_spark(self) -> Column:
        if isinstance(self.value, (list, tuple)):
            return F.array(*[F.lit(v) for v in self.value])
        return F.lit(self.value)

    def references(self) -> set[str]:
        return set()


BINARY_OPS = (
    "add sub eq neq gt gte lt lte mul div or and pow mod xor floor_div "
    "min max concat isin list_contains str_contains str_starts_with "
    "str_ends_with str_split str_find"
).split()


@register
@dataclass(eq=False)
class Binary(Expr):
    """Binary operator (reference op list ``transformation.py:450-477``)."""

    kind: ClassVar[str] = "binary"
    op: str
    left: Expr
    right: Expr

    def to_spark(self) -> Column:
        op, l = self.op, self.left.to_spark()
        # isin takes a raw python list, not a Column
        if op == "isin":
            values = self.right.value if isinstance(self.right, Lit) else None
            if values is None:
                raise ValueError("isin requires a literal list")
            return l.isin(list(values))
        r = self.right.to_spark()
        match op:
            case "add":
                return l + r
            case "sub":
                return l - r
            case "mul":
                return l * r
            case "div":
                return l / r
            case "mod":
                return l % r
            case "pow":
                return l**r
            case "eq":
                return l == r
            case "neq":
                return l != r
            case "gt":
                return l > r
            case "gte":
                return l >= r
            case "lt":
                return l < r
            case "lte":
                return l <= r
            case "and":
                return l & r
            case "or":
                return l | r
            case "xor":
                # logical xor for booleans == inequality; for ints use
                # Binary("bitwise_xor", ...)
                return l != r
            case "bitwise_xor":
                return l.bitwiseXOR(r)
            case "floor_div":
                # Polars floordiv floors; the reference's Spark shim
                # truncates (transformation.py:617-619) — we floor.
                return F.floor(l / r).cast("long")
            case "min":
                return F.least(l, r)
            case "max":
                return F.greatest(l, r)
            case "concat":
                return F.concat(l.cast("string"), r.cast("string"))
            case "list_contains":
                return F.array_contains(l, r)
            case "str_contains":
                return l.contains(r)
            case "str_starts_with":
                return l.startswith(r)
            case "str_ends_with":
                return l.endswith(r)
            case "str_split":
                if not isinstance(self.right, Lit):
                    raise ValueError("str_split separator must be a literal")
                import re as _re

                return F.split(l, _re.escape(str(self.right.value)))
            case "str_find":
                # 0-based, -1 when absent (F.locate is 1-based / 0-absent)
                if not isinstance(self.right, Lit):
                    raise ValueError("str_find needle must be a literal")
                return F.locate(str(self.right.value), l) - 1
            case _:
                raise ValueError(f"unknown binary op {op!r}")


UNARY_OPS = (
    "is_null is_not_null is_nan is_not_nan is_finite is_infinite not "
    "floor ceil round abs sqrt log log10 exp sign sin cos tan cot arcsin "
    "arccos arctan sinh cosh tanh arcsinh arccosh arctanh degrees radians "
    "log1p str_len_char str_to_upper str_to_lower"
).split()


@register
@dataclass(eq=False)
class Unary(Expr):
    """Unary function (reference op list ``transformation.py:829-865``)."""

    kind: ClassVar[str] = "unary"
    op: str
    expr: Expr

    def to_spark(self) -> Column:
        c = self.expr.to_spark()
        match self.op:
            case "is_null":
                return c.isNull()
            case "is_not_null":
                return c.isNotNull()
            case "is_nan":
                return F.isnan(c)
            case "is_not_nan":
                return ~F.isnan(c)
            case "is_finite":
                return (~F.isnan(c)) & (c != F.lit(float("inf"))) & (
                    c != F.lit(float("-inf"))
                )
            case "is_infinite":
                return (c == F.lit(float("inf"))) | (c == F.lit(float("-inf")))
            case "not":
                return ~c
            case "floor":
                return F.floor(c)
            case "ceil":
                return F.ceil(c)
            case "round":
                return F.round(c, 0)
            case "abs":
                return F.abs(c)
            case "sqrt":
                return F.sqrt(c)
            case "log":
                return F.log(c)
            case "log10":
                return F.log10(c)
            case "log1p":
                return F.log1p(c)
            case "exp":
                return F.exp(c)
            case "sign":
                return F.signum(c)
            case "sin":
                return F.sin(c)
            case "cos":
                return F.cos(c)
            case "tan":
                return F.tan(c)
            case "cot":
                return F.cos(c) / F.sin(c)
            case "arcsin":
                return F.asin(c)
            case "arccos":
                return F.acos(c)
            case "arctan":
                return F.atan(c)
            case "sinh":
                return F.sinh(c)
            case "cosh":
                return F.cosh(c)
            case "tanh":
                return F.tanh(c)
            case "arcsinh":
                return F.asinh(c)
            case "arccosh":
                return F.acosh(c)
            case "arctanh":
                return F.atanh(c)
            case "degrees":
                return F.degrees(c)
            case "radians":
                return F.radians(c)
            case "str_len_char":
                return F.length(c)
            case "str_to_upper":
                return F.upper(c)
            case "str_to_lower":
                return F.lower(c)
            case _:
                raise ValueError(f"unknown unary op {self.op!r}")


# ---------------------------------------------------------------------------
# scalar / structural transforms (SURVEY.md §2.3 table)


@register
@dataclass(eq=False)
class TimeDiff(Expr):
    """``front - behind`` in seconds (reference ``TimeDifference:1460``)."""

    kind: ClassVar[str] = "time_diff"
    front: Expr
    behind: Expr
    unit: str = "s"

    _UNIT_SECONDS: ClassVar[dict[str, float]] = {
        "s": 1.0,
        "m": 60.0,
        "h": 3600.0,
        "d": 86400.0,
        "ms": 1e-3,
        "us": 1e-6,
    }

    def to_spark(self) -> Column:
        # micros arithmetic for sub-second precision
        micros = F.unix_micros(self.front.to_spark()) - F.unix_micros(
            self.behind.to_spark()
        )
        divisor = self._UNIT_SECONDS[self.unit] * 1e6
        return micros / F.lit(divisor)


@register
@dataclass(eq=False)
class ToNumerical(Expr):
    """string → float, invalid → null (``ToNumerical:1523``)."""

    kind: ClassVar[str] = "to_num"
    expr: Expr

    def to_spark(self) -> Column:
        # try_cast: malformed strings → null under ANSI mode too
        return self.expr.to_spark().try_cast("double")


@register
@dataclass(eq=False)
class DateComponent(Expr):
    """Extract a date part (``DateComponent:1555``).

    ``weekday`` follows Polars (Mon=1..Sun=7) — Spark ``dayofweek`` is
    Sun=1, hence the modular shift (SURVEY §2.3 semantic trap).
    """

    kind: ClassVar[str] = "date_component"
    expr: Expr
    component: str

    def to_spark(self) -> Column:
        c = self.expr.to_spark()
        match self.component:
            case "year":
                return F.year(c)
            case "iso_year":
                # ISO year of the ISO week (differs from calendar year
                # around Jan 1 / Dec 31)
                return F.year(F.date_sub(F.next_day(F.date_sub(c, 1), "Thu"), 3))
            case "quarter":
                return F.quarter(c)
            case "month":
                return F.month(c)
            case "week":
                return F.weekofyear(c)
            case "day":
                return F.dayofmonth(c)
            case "hour":
                return F.hour(c)
            case "minute":
                return F.minute(c)
            case "second":
                return F.second(c)
            case "millisecond":
                return (F.unix_micros(c) % 1_000_000) / 1000
            case "microsecond":
                return F.unix_micros(c) % 1_000_000
            case "nanosecond":
                return (F.unix_micros(c) % 1_000_000) * 1000
            case "epoch":
                return F.unix_timestamp(c)
            case "weekday":
                return ((F.dayofweek(c) + 5) % 7) + 1
            case "dayofweek":
                return F.dayofweek(c)
            case "ordinal_day":
                return F.dayofyear(c)
            case _:
                raise ValueError(f"unknown date component {self.component!r}")


@register
@dataclass(eq=False)
class ArrayAtIndex(Expr):
    """0-based ``list[i]`` (``ArrayAtIndex:1687``; F.element_at is 1-based)."""

    kind: ClassVar[str] = "array_at_index"
    expr: Expr
    index: int

    def to_spark(self) -> Column:
        if self.index >= 0:
            return F.element_at(self.expr.to_spark(), self.index + 1)
        return F.element_at(self.expr.to_spark(), self.index)


@register
@dataclass(eq=False)
class ArrayContains(Expr):
    """array contains value (literal or column) (``ArrayContains:1769``)."""

    kind: ClassVar[str] = "array_contains"
    expr: Expr
    value: Expr

    def to_spark(self) -> Column:
        return F.array_contains(self.expr.to_spark(), self.value.to_spark())


@register
@dataclass(eq=False)
class ArrayContainsAny(Expr):
    """any overlap with a literal list (``ArrayContainsAny:1721``)."""

    kind: ClassVar[str] = "array_contains_any"
    expr: Expr
    values: list = field(default_factory=list)

    def to_spark(self) -> Column:
        return F.arrays_overlap(
            self.expr.to_spark(), F.array(*[F.lit(v) for v in self.values])
        )


@register
@dataclass(eq=False)
class Ordinal(Expr):
    """category → index by declared order (``Ordinal:1866``).

    The reference joins against a mapping frame; at Spark scale a
    literal-array position lookup stays inside codegen with no shuffle.
    """

    kind: ClassVar[str] = "ordinal"
    expr: Expr
    orders: list = field(default_factory=list)

    def to_spark(self) -> Column:
        arr = F.array(*[F.lit(v) for v in self.orders])
        pos = F.array_position(arr, self.expr.to_spark())
        return F.when(pos > 0, pos - 1).otherwise(F.lit(None)).cast("int")


@register
@dataclass(eq=False)
class ReplaceStrings(Expr):
    """sequential regex replaces (``ReplaceStrings:1907``)."""

    kind: ClassVar[str] = "replace_strings"
    expr: Expr
    pairs: list = field(default_factory=list)  # [(pattern, replacement), ...]

    def to_spark(self) -> Column:
        c = self.expr.to_spark()
        for pattern, replacement in self.pairs:
            c = F.regexp_replace(c, pattern, replacement)
        return c


@register
@dataclass(eq=False)
class FillNa(Expr):
    """fill nulls with a constant or another expression (``FillNaValues:2029``,
    ``FillNaValuesColumns:1985``)."""

    kind: ClassVar[str] = "fill_na"
    expr: Expr
    fill: Expr

    def to_spark(self) -> Column:
        return F.coalesce(self.expr.to_spark(), self.fill.to_spark())


@register
@dataclass(eq=False)
class Copy(Expr):
    """identity / rename (``CopyTransformation:2077``)."""

    kind: ClassVar[str] = "copy"
    expr: Expr

    def to_spark(self) -> Column:
        return self.expr.to_spark()


@register
@dataclass(eq=False)
class MapArgMax(Expr):
    """argmax over probability columns → mapped label (``MapArgMax:2096``).

    Single-column case thresholds at 0.5 (``transformation.py:2117-2138``).
    Implemented as array-of-structs max — stays in codegen, no UDF.
    """

    kind: ClassVar[str] = "map_arg_max"
    #: {col_name: label} or [(col_name, label), ...] (the reference's
    #: ``column_mappings`` is a dict; a bare 2-char string would
    #: otherwise unpack silently into two bogus names)
    column_mappings: Any = field(default_factory=list)

    def _pairs(self) -> list:
        if isinstance(self.column_mappings, dict):
            return list(self.column_mappings.items())
        return list(self.column_mappings)

    def to_spark(self) -> Column:
        pairs = self._pairs()
        if len(pairs) == 1:
            col_name, label = pairs[0]
            return F.when(F.col(col_name) > 0.5, F.lit(label)).otherwise(F.lit(None))
        structs = [
            F.struct(
                F.col(col_name).alias("p"),
                F.lit(i).alias("i"),
                F.lit(label).alias("label"),
            )
            for i, (col_name, label) in enumerate(pairs)
        ]
        return F.array_max(F.array(*structs)).getField("label")

    def references(self) -> set[str]:
        return {c for c, _ in self._pairs()}


@register
@dataclass(eq=False)
class AppendConstString(Expr):
    kind: ClassVar[str] = "append_const_string"
    expr: Expr
    suffix: str = ""

    def to_spark(self) -> Column:
        return F.concat(self.expr.to_spark().cast("string"), F.lit(self.suffix))


@register
@dataclass(eq=False)
class PrependConstString(Expr):
    kind: ClassVar[str] = "prepend_const_string"
    prefix: str = ""
    expr: Expr = None  # type: ignore[assignment]

    def to_spark(self) -> Column:
        return F.concat(F.lit(self.prefix), self.expr.to_spark().cast("string"))


@register
@dataclass(eq=False)
class ConcatStrings(Expr):
    """concat string columns with separator (``AppendStrings:2304``)."""

    kind: ClassVar[str] = "concat_strings"
    exprs: list = field(default_factory=list)
    separator: str = ""

    def to_spark(self) -> Column:
        cols = [e.to_spark().cast("string") for e in self.exprs]
        if self.separator:
            return F.concat_ws(self.separator, *cols)
        return F.concat(*cols)


@register
@dataclass(eq=False)
class StructField_(Expr):
    """``.field`` access with JSON-path fallback when the column is a
    string (``StructField:2712``, fallback ``transformation.py:2736-2742``)."""

    kind: ClassVar[str] = "struct_field"
    expr: Expr
    field_name: str = ""
    from_json_string: bool = False

    def to_spark(self) -> Column:
        if self.from_json_string:
            return F.get_json_object(self.expr.to_spark(), f"$.{self.field_name}")
        return self.expr.to_spark().getField(self.field_name)


@register
@dataclass(eq=False)
class JsonPath(Expr):
    """JSONPath over a string column (``JsonPath:2871``)."""

    kind: ClassVar[str] = "json_path"
    expr: Expr
    path: str = "$"

    def to_spark(self) -> Column:
        return F.get_json_object(self.expr.to_spark(), self.path)


@register
@dataclass(eq=False)
class IsBetween(Expr):
    """lower <= v <= upper (``IsBetweenTransformation:2891``)."""

    kind: ClassVar[str] = "is_between"
    expr: Expr
    lower: Expr
    upper: Expr

    def to_spark(self) -> Column:
        v = self.expr.to_spark()
        return (self.lower.to_spark() <= v) & (v <= self.upper.to_spark())


@register
@dataclass(eq=False)
class Cast(Expr):
    """cast to FeatureType (``CastTransform:2933``)."""

    kind: ClassVar[str] = "cast"
    expr: Expr
    dtype: str = "string"  # FeatureType name

    def to_spark(self) -> Column:
        return self.expr.to_spark().cast(FeatureType(self.dtype).spark_type)


@register
@dataclass(eq=False)
class LogBase(Expr):
    """log base b (``Log:2981``)."""

    kind: ClassVar[str] = "log_base"
    expr: Expr
    base: float = math.e

    def to_spark(self) -> Column:
        return F.log(float(self.base), self.expr.to_spark())


@register
@dataclass(eq=False)
class Clip(Expr):
    """clamp to [lower, upper] (``Clip:2630``)."""

    kind: ClassVar[str] = "clip"
    expr: Expr
    lower: float = 0.0
    upper: float = 1.0

    def to_spark(self) -> Column:
        c = self.expr.to_spark()
        return F.least(F.greatest(c, F.lit(self.lower)), F.lit(self.upper))


@register
@dataclass(eq=False)
class FormatString(Expr):
    """printf-style formatting over columns (``FormatStringTransformation:3084``).

    The reference row-loops ``str.format``; a static pattern compiles
    to ``F.format_string`` — fully vectorized, no Python in the loop.
    """

    kind: ClassVar[str] = "format_string"
    pattern: str = ""
    exprs: list = field(default_factory=list)

    def to_spark(self) -> Column:
        return F.format_string(self.pattern, *[e.to_spark() for e in self.exprs])


@register
@dataclass(eq=False)
class ListDotProduct(Expr):
    """elementwise multiply + sum of two array columns
    (``ListDotProduct:3115``). Pure higher-order functions — codegen'd,
    no UDF, safe at any scale."""

    kind: ClassVar[str] = "list_dot_product"
    left: Expr
    right: Expr

    def to_spark(self) -> Column:
        return F.aggregate(
            F.zip_with(self.left.to_spark(), self.right.to_spark(), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )


@register
@dataclass(eq=False)
class HashColumns(Expr):
    """hash of columns → int64 (``HashColumns:3170``).

    Uses ``xxhash64`` — deliberately NOT bit-identical to Polars'
    hash (different function); stable within this engine.
    """

    kind: ClassVar[str] = "hash_columns"
    columns: list = field(default_factory=list)

    def to_spark(self) -> Column:
        return F.xxhash64(*[F.col(c) for c in self.columns])

    def references(self) -> set[str]:
        return set(self.columns)


@register
@dataclass(eq=False)
class EuclideanDistance(Expr):
    """2-D coordinate distance (``Coordinate.eucledian_distance``
    ``feature_factory.py:2488-2495``)."""

    kind: ClassVar[str] = "euclidean_distance"
    x1: Expr
    y1: Expr
    x2: Expr
    y2: Expr

    def to_spark(self) -> Column:
        dx = self.x1.to_spark() - self.x2.to_spark()
        dy = self.y1.to_spark() - self.y2.to_spark()
        return F.sqrt(dx * dx + dy * dy)


@register
@dataclass(eq=False)
class CosineSimilarity(Expr):
    """cosine similarity of two array<float> columns — codegen'd HOFs."""

    kind: ClassVar[str] = "cosine_similarity"
    left: Expr
    right: Expr

    def to_spark(self) -> Column:
        l, r = self.left.to_spark(), self.right.to_spark()

        def dot(a: Column, b: Column) -> Column:
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        return dot(l, r) / (F.sqrt(dot(l, l)) * F.sqrt(dot(r, r)))


@register
@dataclass(eq=False)
class Multi(Expr):
    """sequential sub-transformations with intermediate aliases
    (``MultiTransformation:3194``; compiled from anonymous "hidden
    features" ``feature_view.py:906-933``).

    Since Spark Columns compose as expression trees we inline the
    steps: each step's alias becomes a substitution for later steps.
    Handled at plan level (plans/derive.py) — kept here for
    serializability.
    """

    kind: ClassVar[str] = "multi"
    steps: list = field(default_factory=list)  # [(alias, Expr), ...]

    def to_spark(self) -> Column:
        raise NotImplementedError(
            "Multi must be expanded by the planner into withColumn rounds "
            "(operators.core.derive does this)"
        )

    def references(self) -> set[str]:
        """Source columns = union of step references minus the
        intermediate aliases the steps themselves define (the base
        implementation misses tuple-wrapped Exprs entirely)."""
        aliases = {alias for alias, _ in self.steps}
        out: set[str] = set()
        for _, e in self.steps:
            out |= e.references()
        return out - aliases

    def to_dict(self) -> dict[str, Any]:
        return {
            "kind": self.kind,
            "steps": [[alias, _encode(e)] for alias, e in self.steps],
        }

    @classmethod
    def _from_dict(cls, data: dict[str, Any]) -> "Multi":
        return cls(steps=[(alias, _decode(e)) for alias, e in data["steps"]])


@register
@dataclass(eq=False)
class LoadFeatureRef(Expr):
    """Cross-contract lookup (``LoadFeature:3028-3081``; factory
    ``for_entities`` ``feature_factory.py:813``): fetch ``feature``
    from ``view`` using current columns as that view's entities.

    Plan-level: requires the store catalog and a join, so
    ``to_spark`` raises; ``ContractStore`` resolves it (explode for
    list keys → left join → ordered re-aggregation).
    """

    kind: ClassVar[str] = "load_feature"
    view: str = ""
    feature: str = ""
    #: fact-frame column → target-view entity column
    entity_mapping: dict = field(default_factory=dict)

    def to_spark(self) -> Column:
        raise NotImplementedError(
            "LoadFeatureRef must be resolved by ContractStore "
            "(it joins against another view)"
        )

    def references(self) -> set[str]:
        return set(self.entity_mapping.keys())


@register
@dataclass(eq=False)
class WordVectorise(Expr):
    """text → embedding via a model (``WordVectoriser:2179``).

    Model inference libs are not in this container — the Spark-side
    plumbing is real (Arrow-batched pandas UDF over strings returning
    array<float>); the embedding function is a deterministic fake
    unless a real ``model_fn`` is supplied.
    """

    kind: ClassVar[str] = "word_vectorise"
    expr: Expr
    size: int = 16

    def to_spark(self) -> Column:
        from aligned_spark.functions.embeddings import fake_text_embedding

        return fake_text_embedding(self.expr.to_spark(), self.size)


@register
@dataclass(eq=False)
class LoadImageBytes(Expr):
    """URL/path → binary, fetched executor-side
    (``LoadImageUrlBytes:2201``; the reference collects URLs to the
    driver — here the fetch is an Arrow-batched column op)."""

    kind: ClassVar[str] = "load_image_bytes"
    expr: Expr

    def to_spark(self) -> Column:
        from aligned_spark.functions.images import load_image_bytes

        return load_image_bytes(self.expr.to_spark())


@register
@dataclass(eq=False)
class LoadImage(Expr):
    """URL/path → decoded H×W×C tensor (``LoadImageUrl:2228``).
    Codec: PIL if importable, else a deterministic fake — see
    :mod:`aligned_spark.functions.images`."""

    kind: ClassVar[str] = "load_image"
    expr: Expr

    def to_spark(self) -> Column:
        from aligned_spark.functions.images import (
            decode_image,
            load_image_bytes,
        )

        return decode_image(load_image_bytes(self.expr.to_spark()))


@register
@dataclass(eq=False)
class GrayscaleImage(Expr):
    """H×W×C tensor → H×W channel mean (``GrayscaleImage:2259``)."""

    kind: ClassVar[str] = "grayscale_image"
    expr: Expr

    def to_spark(self) -> Column:
        from aligned_spark.functions.images import grayscale_image

        return grayscale_image(self.expr.to_spark())


@register
@dataclass(eq=False)
class PresignedAwsUrlExpr(Expr):
    """S3 key → presigned GET URL (``PresignedAwsUrl:2671``). Needs
    boto3 or an injected signer at execution time."""

    kind: ClassVar[str] = "presigned_aws_url"
    expr: Expr
    bucket: str = ""
    max_age_seconds: int = 30

    def to_spark(self) -> Column:
        from aligned_spark.functions.images import presigned_aws_url

        return presigned_aws_url(
            self.expr.to_spark(), self.bucket, self.max_age_seconds
        )


class PandasTransform:
    """DataFrame-level pandas function escape hatch
    (``PandasLambdaTransformation:1327`` / ``PandasFunctionTransformation:1267``).

    Not serializable-by-value here (no dill in the contract store);
    holds a callable applied via ``mapInPandas`` with an explicit
    output schema. The Arrow batch path, never row-at-a-time.
    """

    def __init__(self, fn: Callable, output: "tuple[str, FeatureType]"):
        self.fn = fn
        self.output = output


__all__ = [
    "Expr",
    "Col",
    "Lit",
    "Binary",
    "Unary",
    "BINARY_OPS",
    "UNARY_OPS",
    "TimeDiff",
    "ToNumerical",
    "DateComponent",
    "ArrayAtIndex",
    "ArrayContains",
    "ArrayContainsAny",
    "Ordinal",
    "ReplaceStrings",
    "FillNa",
    "Copy",
    "MapArgMax",
    "AppendConstString",
    "PrependConstString",
    "ConcatStrings",
    "StructField_",
    "JsonPath",
    "IsBetween",
    "Cast",
    "LogBase",
    "Clip",
    "FormatString",
    "ListDotProduct",
    "HashColumns",
    "EuclideanDistance",
    "CosineSimilarity",
    "Multi",
    "WordVectorise",
    "LoadImageBytes",
    "LoadImage",
    "GrayscaleImage",
    "PresignedAwsUrlExpr",
    "PandasTransform",
    "expr_from_dict",
]
