"""Contract DSL: ``@feature_view`` / ``@model_contract`` and the
feature-factory sugar that compiles to the expression IR.

Reference: ``@feature_view`` decorator
(``aligned/feature_view/feature_view.py:673``), ``FeatureFactory``
operator sugar (``aligned/compiler/feature_factory.py:840-1489``),
aggregation factories (``aligned/compiler/aggregation_factory.py``),
``@model_contract`` (``aligned/compiler/model.py``).

One deliberate simplification versus the reference: anonymous
intermediate expressions ("hidden features",
``feature_view.py:906-933`` → ``MultiTransformation``) are *inlined*
into the consuming expression at compile time — Spark Columns compose
to arbitrary depth inside a single projection, so intermediate
materialization buys nothing.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from aligned_spark import expr as E
from aligned_spark.constraints import (
    Constraint,
    EndsWith,
    InDomain,
    LowerBound,
    LowerBoundInclusive,
    MaxLength,
    MinLength,
    Regex,
    Required,
    StartsWith,
    Unique,
    UpperBound,
    UpperBoundInclusive,
)
from aligned_spark.operators.aggregate import AggSpec
from aligned_spark.types import EventTimestamp as EventTimestampSchema
from aligned_spark.types import Feature, FeatureLocation, FeatureReference, FeatureType


class FactoryRef(E.Expr):
    """IR leaf that points at a FeatureFactory object; resolved to a
    ``Col`` (named factory) or inlined (anonymous intermediate) when
    the view compiles."""

    kind = "factory_ref"

    def __init__(self, factory: "FeatureFactory"):
        self.factory = factory

    def to_spark(self):
        raise RuntimeError("FactoryRef must be resolved at view compile time")

    def references(self) -> set[str]:
        if self.factory._name:
            return {self.factory._name}
        if self.factory.transformation is not None:
            return self.factory.transformation.references()
        return set()


def resolve_refs(e: E.Expr) -> E.Expr:
    """Replace FactoryRef leaves: named factory → Col(name); anonymous
    factory with a transformation → inline its (resolved) expression."""
    if isinstance(e, FactoryRef):
        fac = e.factory
        if fac._name:
            return E.Col(fac._name)
        if fac.transformation is not None:
            return resolve_refs(fac.transformation)
        raise ValueError("unresolvable anonymous feature with no transformation")
    out = copy.copy(e)
    for key, value in list(out.__dict__.items()):
        if isinstance(value, E.Expr):
            setattr(out, key, resolve_refs(value))
        elif isinstance(value, list):
            setattr(
                out,
                key,
                [
                    resolve_refs(v)
                    if isinstance(v, E.Expr)
                    else (
                        (v[0], resolve_refs(v[1]))
                        if isinstance(v, tuple) and len(v) == 2 and isinstance(v[1], E.Expr)
                        else v
                    )
                    for v in value
                ],
            )
    return out


def _wrap(value: Any) -> E.Expr:
    if isinstance(value, FeatureFactory):
        return FactoryRef(value)
    if isinstance(value, E.Expr):
        return value
    return E.Lit(value)


class FeatureFactory:
    """A declared (or derived) feature under construction."""

    dtype: FeatureType = FeatureType("string")

    def __init__(self, dtype: FeatureType | None = None):
        if dtype is not None:
            self.dtype = dtype
        self._name: str | None = None
        self.transformation: E.Expr | None = None
        self.constraints: list[Constraint] = []
        self._is_entity = False
        self._optional = False
        self._default: Any = None
        self._description: str | None = None
        self._tags: list[str] = []

    # -- builder metadata ------------------------------------------------
    def as_entity(self) -> "FeatureFactory":
        self._is_entity = True
        return self

    def is_optional(self) -> "FeatureFactory":
        self._optional = True
        return self

    def default_value(self, value: Any) -> "FeatureFactory":
        self._optional = True
        self._default = value
        return self

    def description(self, text: str) -> "FeatureFactory":
        self._description = text
        return self

    def with_tag(self, tag: str) -> "FeatureFactory":
        self._tags.append(tag)
        return self

    # measurement-level markers (reference
    # ``feature_factory.py:554-594``): documentation tags recording
    # the statistical level of a feature — no compute semantics, but
    # part of the contract surface tooling reads (e.g. to pick
    # encoders: nominal → one-hot, ordinal → ordinal codes)
    def is_nominal(self) -> "FeatureFactory":
        """Categories without order (reference :554)."""
        return self.with_tag("is_nominal")

    def is_ordinal(self) -> "FeatureFactory":
        """Ordered categories without scale (reference :564)."""
        return self.with_tag("is_ordinal")

    def is_interval(self) -> "FeatureFactory":
        """Equal intervals, no true zero (reference :574)."""
        return self.with_tag("is_interval")

    def is_ratio(self) -> "FeatureFactory":
        """Equal intervals with a true zero (reference :584)."""
        return self.with_tag("is_ratio")

    # -- constraints -------------------------------------------------------
    def _constrained(self, c: Constraint) -> "FeatureFactory":
        self.constraints.append(c)
        return self

    def lower_bound(self, v: float, inclusive: bool = True) -> "FeatureFactory":
        return self._constrained(LowerBoundInclusive(v) if inclusive else LowerBound(v))

    def upper_bound(self, v: float, inclusive: bool = True) -> "FeatureFactory":
        return self._constrained(UpperBoundInclusive(v) if inclusive else UpperBound(v))

    def bounded_between(self, lo: float, hi: float) -> "FeatureFactory":
        return self.lower_bound(lo).upper_bound(hi)

    def accepted_values(self, values: list) -> "FeatureFactory":
        return self._constrained(InDomain(list(values)))

    def validate_regex(self, pattern: str) -> "FeatureFactory":
        return self._constrained(Regex(pattern))

    def min_length(self, n: int) -> "FeatureFactory":
        return self._constrained(MinLength(n))

    def max_length(self, n: int) -> "FeatureFactory":
        return self._constrained(MaxLength(n))

    def starts_with_constraint(self, s: str) -> "FeatureFactory":
        return self._constrained(StartsWith(s))

    def ends_with_constraint(self, s: str) -> "FeatureFactory":
        return self._constrained(EndsWith(s))

    def is_unique(self) -> "FeatureFactory":
        return self._constrained(Unique())

    def is_required(self) -> "FeatureFactory":
        return self._constrained(Required())

    # -- derivation helpers -------------------------------------------------
    def _derived(self, dtype: FeatureType, transformation: E.Expr) -> "FeatureFactory":
        out = _FACTORY_FOR_TYPE(dtype)
        out.transformation = transformation
        return out

    def _ref(self) -> E.Expr:
        return FactoryRef(self)

    def _bin(self, op: str, other: Any, dtype: FeatureType, reverse: bool = False):
        rhs = _wrap(other)
        tr = (
            E.Binary(op, rhs, self._ref())
            if reverse
            else E.Binary(op, self._ref(), rhs)
        )
        return self._derived(dtype, tr)

    # arithmetic (numeric result keeps a permissive float64/int64 dtype)
    def __add__(self, o):
        return self._bin("add", o, self.dtype)

    def __radd__(self, o):
        return self._bin("add", o, self.dtype, True)

    def __sub__(self, o):
        return self._bin("sub", o, self.dtype)

    def __rsub__(self, o):
        return self._bin("sub", o, self.dtype, True)

    def __mul__(self, o):
        return self._bin("mul", o, self.dtype)

    def __rmul__(self, o):
        return self._bin("mul", o, self.dtype, True)

    def __truediv__(self, o):
        return self._bin("div", o, FeatureType("float64"))

    def __rtruediv__(self, o):
        return self._bin("div", o, FeatureType("float64"), True)

    def __floordiv__(self, o):
        return self._bin("floor_div", o, FeatureType("int64"))

    def __mod__(self, o):
        return self._bin("mod", o, self.dtype)

    def __pow__(self, o):
        return self._bin("pow", o, FeatureType("float64"))

    # comparison / logic
    def __eq__(self, o):  # type: ignore[override]
        return self._bin("eq", o, FeatureType("bool"))

    def __ne__(self, o):  # type: ignore[override]
        return self._bin("neq", o, FeatureType("bool"))

    def __gt__(self, o):
        return self._bin("gt", o, FeatureType("bool"))

    def __ge__(self, o):
        return self._bin("gte", o, FeatureType("bool"))

    def __lt__(self, o):
        return self._bin("lt", o, FeatureType("bool"))

    def __le__(self, o):
        return self._bin("lte", o, FeatureType("bool"))

    def __and__(self, o):
        return self._bin("and", o, FeatureType("bool"))

    def __or__(self, o):
        return self._bin("or", o, FeatureType("bool"))

    def __invert__(self):
        return self._derived(FeatureType("bool"), E.Unary("not", self._ref()))

    def __hash__(self):
        return id(self)

    # generic scalar sugar
    def fill_na(self, value: Any) -> "FeatureFactory":
        return self._derived(self.dtype, E.FillNa(self._ref(), _wrap(value)))

    def is_null(self):
        return self._derived(FeatureType("bool"), E.Unary("is_null", self._ref()))

    def is_not_null(self):
        return self._derived(FeatureType("bool"), E.Unary("is_not_null", self._ref()))

    def is_in(self, values: list):
        return self._derived(FeatureType("bool"), E.Binary("isin", self._ref(), E.Lit(list(values))))

    def is_between(self, lower: Any, upper: Any):
        return self._derived(
            FeatureType("bool"), E.IsBetween(self._ref(), _wrap(lower), _wrap(upper))
        )

    def cast_as(self, dtype: FeatureType) -> "FeatureFactory":
        return self._derived(dtype, E.Cast(self._ref(), dtype.name))

    def copy_as(self) -> "FeatureFactory":
        return self._derived(self.dtype, E.Copy(self._ref()))

    def hash_value(self, *other_columns: "FeatureFactory") -> "FeatureFactory":
        # resolved at compile when names exist
        cols = [self] + list(other_columns)
        out = Int64()
        out.transformation = _LazyHash(cols)
        return out

    def transformed_using(
        self, dtype: FeatureType, fn: Callable[[E.Expr], E.Expr]
    ) -> "FeatureFactory":
        """Custom IR transformation over this feature's expression."""
        return self._derived(dtype, fn(self._ref()))


class _LazyHash(E.Expr):
    kind = "lazy_hash"

    def __init__(self, factories: list[FeatureFactory]):
        self.factories = factories

    def to_spark(self):
        raise RuntimeError("must be resolved at compile time")


class _Numeric(FeatureFactory):
    def abs(self):
        return self._derived(self.dtype, E.Unary("abs", self._ref()))

    def floor(self):
        return self._derived(FeatureType("int64"), E.Unary("floor", self._ref()))

    def ceil(self):
        return self._derived(FeatureType("int64"), E.Unary("ceil", self._ref()))

    def round(self):
        return self._derived(FeatureType("int64"), E.Unary("round", self._ref()))

    def sqrt(self):
        return self._derived(FeatureType("float64"), E.Unary("sqrt", self._ref()))

    def log(self):
        return self._derived(FeatureType("float64"), E.Unary("log", self._ref()))

    def log1p(self):
        return self._derived(FeatureType("float64"), E.Unary("log1p", self._ref()))

    def log_base(self, base: float):
        return self._derived(FeatureType("float64"), E.LogBase(self._ref(), base))

    def log10(self):
        return self._derived(FeatureType("float64"), E.Unary("log10", self._ref()))

    def exp(self):
        return self._derived(FeatureType("float64"), E.Unary("exp", self._ref()))

    def sign(self):
        return self._derived(FeatureType("float64"), E.Unary("sign", self._ref()))

    def sin(self):
        return self._derived(FeatureType("float64"), E.Unary("sin", self._ref()))

    def cos(self):
        return self._derived(FeatureType("float64"), E.Unary("cos", self._ref()))

    def tan(self):
        return self._derived(FeatureType("float64"), E.Unary("tan", self._ref()))

    def clip(self, lower: float, upper: float):
        return self._derived(self.dtype, E.Clip(self._ref(), lower, upper))

    def min_of(self, other):
        return self._derived(self.dtype, E.Binary("min", self._ref(), _wrap(other)))

    def max_of(self, other):
        return self._derived(self.dtype, E.Binary("max", self._ref(), _wrap(other)))

    def is_nan(self):
        return self._derived(FeatureType("bool"), E.Unary("is_nan", self._ref()))

    def aggregate(self) -> "AggregationFactory":
        return AggregationFactory(self)

    def to_string(self):
        return self._derived(FeatureType("string"), E.Cast(self._ref(), "string"))


class String(FeatureFactory):
    dtype = FeatureType("string")

    def contains(self, value: Any):
        return self._derived(
            FeatureType("bool"), E.Binary("str_contains", self._ref(), _wrap(value))
        )

    def starts_with(self, value: str):
        return self._derived(
            FeatureType("bool"), E.Binary("str_starts_with", self._ref(), E.Lit(value))
        )

    def ends_with(self, value: str):
        return self._derived(
            FeatureType("bool"), E.Binary("str_ends_with", self._ref(), E.Lit(value))
        )

    def to_lower(self):
        return self._derived(FeatureType("string"), E.Unary("str_to_lower", self._ref()))

    def to_upper(self):
        return self._derived(FeatureType("string"), E.Unary("str_to_upper", self._ref()))

    def str_len(self):
        return self._derived(FeatureType("int64"), E.Unary("str_len_char", self._ref()))

    def split(self, separator: str):
        out = List(FeatureType.array(FeatureType("string")))
        out.transformation = E.Binary("str_split", self._ref(), E.Lit(separator))
        return out

    def find(self, needle: str):
        return self._derived(
            FeatureType("int64"), E.Binary("str_find", self._ref(), E.Lit(needle))
        )

    def replace(self, pairs: dict[str, str]):
        return self._derived(
            FeatureType("string"), E.ReplaceStrings(self._ref(), list(pairs.items()))
        )

    def append(self, suffix: Any):
        if isinstance(suffix, str):
            return self._derived(
                FeatureType("string"), E.AppendConstString(self._ref(), suffix)
            )
        return self._derived(
            FeatureType("string"),
            E.ConcatStrings([self._ref(), _wrap(suffix)]),
        )

    def prepend(self, prefix: Any):
        if isinstance(prefix, str):
            return self._derived(
                FeatureType("string"), E.PrependConstString(prefix, self._ref())
            )
        return self._derived(
            FeatureType("string"),
            E.ConcatStrings([_wrap(prefix), self._ref()]),
        )

    def to_numerical(self):
        return self._derived(FeatureType("float64"), E.ToNumerical(self._ref()))

    def json_path(self, path: str):
        return self._derived(FeatureType("string"), E.JsonPath(self._ref(), path))

    def field(self, name: str):
        return self._derived(
            FeatureType("string"),
            E.StructField_(self._ref(), name, from_json_string=True),
        )

    def one_hot_encode(self, values: list[str]) -> "list[FeatureFactory]":
        return [self == v for v in values]

    def ordinal_categories(self, orders: list[str]):
        return self._derived(FeatureType("int32"), E.Ordinal(self._ref(), orders))

    def embedding(self, size: int = 16):
        out = Embedding(size)
        out.transformation = E.WordVectorise(self._ref(), size)
        return out

    def as_image_url(self) -> "ImageUrl":
        """Re-type this string as an image URL
        (``feature_factory.py:2163``)."""
        out = ImageUrl()
        out.transformation = E.Copy(self._ref())
        return out

    def aggregate(self) -> "AggregationFactory":
        return AggregationFactory(self)


class Bool(FeatureFactory):
    dtype = FeatureType("bool")


class Int8(_Numeric):
    dtype = FeatureType("int8")


class Int16(_Numeric):
    dtype = FeatureType("int16")


class Int32(_Numeric):
    dtype = FeatureType("int32")


class Int64(_Numeric):
    dtype = FeatureType("int64")


class UInt8(_Numeric):
    dtype = FeatureType("uint8")


class UInt16(_Numeric):
    dtype = FeatureType("uint16")


class UInt32(_Numeric):
    dtype = FeatureType("uint32")


class UInt64(_Numeric):
    dtype = FeatureType("uint64")


class Float32(_Numeric):
    dtype = FeatureType("float32")


class Float64(_Numeric):
    dtype = FeatureType("float64")


# reference alias: Float = float32 (`feature.py:254`)
Float = Float32


class UUID(FeatureFactory):
    dtype = FeatureType("uuid")


class Json(String):
    dtype = FeatureType("json")


class Binary(FeatureFactory):
    dtype = FeatureType("binary")


class ImageUrl(String):
    """A string column holding an image URL/path
    (``feature_factory.py:2441``)."""

    def load_image(self) -> "Image":
        out = Image()
        out.transformation = E.LoadImage(self._ref())
        return out

    def load_bytes(self) -> "Binary":
        out = Binary()
        out.transformation = E.LoadImageBytes(self._ref())
        return out

    def presigned_url(
        self, bucket: str, max_age_seconds: int = 30
    ) -> "String":
        out = String()
        out.transformation = E.PresignedAwsUrlExpr(
            self._ref(), bucket, max_age_seconds
        )
        return out


class Image(FeatureFactory):
    """A decoded H×W×C image tensor (``feature_factory.py:2469``)."""

    dtype = FeatureType.array(
        FeatureType.array(FeatureType.array(FeatureType("float64")))
    )

    def to_grayscale(self) -> "Image":
        out = Image()
        out.dtype = FeatureType.array(
            FeatureType.array(FeatureType("float64"))
        )
        out.transformation = E.GrayscaleImage(self._ref())
        return out


class Date(FeatureFactory):
    dtype = FeatureType("date")


class Timestamp(FeatureFactory):
    dtype = FeatureType("datetime-UTC")

    def date_component(self, component: str):
        return self._derived(
            FeatureType("int32"), E.DateComponent(self._ref(), component)
        )

    @property
    def year(self):
        return self.date_component("year")

    @property
    def month(self):
        return self.date_component("month")

    @property
    def day(self):
        return self.date_component("day")

    @property
    def hour(self):
        return self.date_component("hour")

    @property
    def minute(self):
        return self.date_component("minute")

    @property
    def second(self):
        return self.date_component("second")

    @property
    def quarter(self):
        return self.date_component("quarter")

    @property
    def week(self):
        return self.date_component("week")

    @property
    def weekday(self):
        return self.date_component("weekday")

    @property
    def ordinal_day(self):
        return self.date_component("ordinal_day")

    @property
    def epoch(self):
        return self._derived(FeatureType("int64"), E.DateComponent(self._ref(), "epoch"))

    def time_since(self, other, unit: str = "s"):
        return self._derived(
            FeatureType("float64"), E.TimeDiff(self._ref(), _wrap(other), unit)
        )


class EventTimestamp(Timestamp):
    """The view's row-validity timestamp; at most one per view
    (enforced at compile, reference ``feature_view.py:939-946``)."""

    def __init__(self, ttl_seconds: int | None = None):
        super().__init__()
        self.ttl_seconds = ttl_seconds


class List(FeatureFactory):
    dtype = FeatureType("array")

    def __init__(self, dtype: FeatureType | None = None):
        super().__init__(dtype or FeatureType.array(FeatureType("string")))

    def at_index(self, i: int):
        sub = self.dtype.array_subtype
        return self._derived(sub, E.ArrayAtIndex(self._ref(), i))

    def contains(self, value: Any):
        return self._derived(
            FeatureType("bool"), E.ArrayContains(self._ref(), _wrap(value))
        )

    def contains_any(self, values: list):
        return self._derived(
            FeatureType("bool"), E.ArrayContainsAny(self._ref(), list(values))
        )


class Embedding(List):
    def __init__(self, size: int):
        super().__init__(FeatureType.embedding(size))
        self.size = size
        self.index_metadata: dict | None = None

    def dot_product(self, other):
        out = Float64()
        out.transformation = E.ListDotProduct(self._ref(), _wrap(other))
        return out

    def cosine_similarity(self, other):
        out = Float64()
        out.transformation = E.CosineSimilarity(self._ref(), _wrap(other))
        return out

    def indexed(self, **metadata) -> "Embedding":
        """Mark for ANN indexing (``VectorIndexFactory`` parity)."""
        self.index_metadata = metadata
        return self


class Struct(FeatureFactory):
    dtype = FeatureType("struct")

    def field(self, name: str, dtype: FeatureType | None = None):
        out = FeatureFactory(dtype or FeatureType("string"))
        out.transformation = E.StructField_(self._ref(), name)
        return out


class Coordinate:
    """Pair of numeric factories with distance sugar
    (``feature_factory.py:2488-2495``)."""

    def __init__(self, x: FeatureFactory, y: FeatureFactory):
        self.x = x
        self.y = y

    def euclidean_distance(self, other: "Coordinate") -> FeatureFactory:
        out = Float64()
        out.transformation = E.EuclideanDistance(
            _wrap(self.x), _wrap(self.y), _wrap(other.x), _wrap(other.y)
        )
        return out


def _FACTORY_FOR_TYPE(dtype: FeatureType) -> FeatureFactory:
    base = dtype.base_name
    mapping: dict[str, type[FeatureFactory]] = {
        "string": String,
        "bool": Bool,
        "int8": Int8,
        "int16": Int16,
        "int32": Int32,
        "int64": Int64,
        "uint8": UInt8,
        "uint16": UInt16,
        "uint32": UInt32,
        "uint64": UInt64,
        "float32": Float32,
        "float64": Float64,
        "date": Date,
        "datetime": Timestamp,
        "uuid": UUID,
        "json": Json,
        "binary": Binary,
    }
    cls = mapping.get(base)
    if cls is not None:
        out = cls()
        out.dtype = dtype
        return out
    if base in ("array", "embedding"):
        return List(dtype)
    if base == "struct":
        out = Struct()
        out.dtype = dtype
        return out
    return FeatureFactory(dtype)


# ---------------------------------------------------------------------------
# aggregation factories


@dataclass
class AggregateWindow:
    """``AggregateOver`` port (``derivied_feature.py:92-108``)."""

    window_seconds: float | None = None
    every_seconds: float | None = None
    offset_seconds: float | None = None


class AggregatedFeatureFactory(FeatureFactory):
    """A feature defined as an aggregation over the view's rows."""

    def __init__(
        self,
        dtype: FeatureType,
        kind: str,
        source: FeatureFactory | None,
        percentile: float | None = None,
        separator: str = "",
    ):
        super().__init__(dtype)
        self.agg_kind = kind
        self.agg_source = source
        self.agg_percentile = percentile
        self.agg_separator = separator
        self.window = AggregateWindow()

    def over(
        self,
        *,
        seconds: float | None = None,
        minutes: float | None = None,
        hours: float | None = None,
        days: float | None = None,
        every_seconds: float | None = None,
        offset_seconds: float | None = None,
    ) -> "AggregatedFeatureFactory":
        total = (
            (seconds or 0)
            + (minutes or 0) * 60
            + (hours or 0) * 3600
            + (days or 0) * 86400
        )
        self.window = AggregateWindow(
            window_seconds=total or None,
            every_seconds=every_seconds,
            offset_seconds=offset_seconds,
        )
        return self


class AggregationFactory:
    """``feature.aggregate()`` → terminal agg methods
    (``aligned/compiler/aggregation_factory.py:40-338``)."""

    def __init__(self, source: FeatureFactory):
        self.source = source

    def _make(self, kind: str, dtype: FeatureType | None = None, **kw):
        return AggregatedFeatureFactory(
            dtype or self.source.dtype, kind, self.source, **kw
        )

    def sum(self):
        return self._make("sum")

    def mean(self):
        return self._make("mean", FeatureType("float64"))

    def min(self):
        return self._make("min")

    def max(self):
        return self._make("max")

    def count(self):
        return self._make("count", FeatureType("int64"))

    def count_distinct(self):
        return self._make("count_distinct", FeatureType("int64"))

    def std(self):
        return self._make("std", FeatureType("float64"))

    def variance(self):
        return self._make("variance", FeatureType("float64"))

    def median(self):
        return self._make("median", FeatureType("float64"))

    def percentile(self, q: float):
        return self._make("percentile", FeatureType("float64"), percentile=q)

    def concat_string(self, separator: str = ""):
        return self._make(
            "concat_string", FeatureType("string"), separator=separator
        )


# ---------------------------------------------------------------------------
# compiled views


@dataclass
class CompiledAggregation:
    name: str
    spec: AggSpec
    window: AggregateWindow
    dtype: FeatureType


@dataclass
class CompiledFeatureView:
    """The catalog entry (reference ``CompiledFeatureView``,
    ``aligned/schemas/feature_view.py:40``)."""

    name: str
    source: Any
    entities: list[str]
    features: list[Feature]
    derived: dict[str, E.Expr]
    derived_dtypes: dict[str, FeatureType]
    aggregations: list[CompiledAggregation]
    event_timestamp: EventTimestampSchema | None
    constraints: dict[str, list[Constraint]]
    defaults: dict[str, tuple[Any, FeatureType]]
    description: str | None = None
    materialized_source: Any = None
    stream_source: Any = None
    tags: dict[str, list[str]] = dc_field(default_factory=dict)

    @property
    def request(self):
        from aligned_spark.requests import RetrievalRequest

        return RetrievalRequest.from_view(self)

    def all_feature_names(self) -> list[str]:
        return (
            [f.name for f in self.features]
            + list(self.derived)
            + [a.name for a in self.aggregations]
        )


class FeatureViewWrapper:
    """What ``@feature_view`` returns: the original class plus the
    compiled contract and query helpers."""

    def __init__(self, view: CompiledFeatureView, cls: type):
        self.compiled = view
        self._cls = cls
        self.__name__ = getattr(cls, "__name__", view.name)
        self.__doc__ = getattr(cls, "__doc__", None)

    @property
    def name(self) -> str:
        return self.compiled.name

    def query(self, spark=None):
        from aligned_spark.plans.view_query import FeatureViewQuery

        return FeatureViewQuery(self.compiled, spark)

    def join(self, other: "FeatureViewWrapper", on: str | list[str], how: str = "inner"):
        from aligned_spark.plans.view_query import joined_views

        return joined_views(self, other, on, how)

    def vstack(self, other: "FeatureViewWrapper", source_column: str | None = None):
        from aligned_spark.plans.view_query import stacked_views

        return stacked_views(self, other, source_column)

    def __call__(self):  # reference API parity: instantiate the schema class
        return self._cls()


def _compile_view(
    cls: type,
    name: str,
    source: Any,
    materialized_source: Any = None,
    stream_source: Any = None,
    description: str | None = None,
) -> CompiledFeatureView:
    entities: list[str] = []
    features: list[Feature] = []
    derived: dict[str, E.Expr] = {}
    derived_dtypes: dict[str, FeatureType] = {}
    aggregations: list[CompiledAggregation] = []
    event_ts: EventTimestampSchema | None = None
    constraints: dict[str, list[Constraint]] = {}
    defaults: dict[str, tuple[Any, FeatureType]] = {}
    tags: dict[str, list[str]] = {}

    members = [
        (k, v) for k, v in vars(cls).items() if isinstance(v, FeatureFactory)
    ]
    # first pass: assign names so FactoryRefs can resolve
    for attr_name, factory in members:
        factory._name = attr_name

    for attr_name, factory in members:
        if factory.constraints:
            constraints[attr_name] = list(factory.constraints)
        if factory._optional and factory._default is not None:
            defaults[attr_name] = (factory._default, factory.dtype)
        if factory._tags:
            tags[attr_name] = list(factory._tags)

        if isinstance(factory, AggregatedFeatureFactory):
            source_expr = (
                resolve_refs(_wrap(factory.agg_source))
                if factory.agg_source is not None
                else None
            )
            spec = AggSpec(
                name=attr_name,
                kind=factory.agg_kind,  # type: ignore[arg-type]
                column=source_expr,
                percentile=factory.agg_percentile,
                separator=factory.agg_separator,
            )
            aggregations.append(
                CompiledAggregation(attr_name, spec, factory.window, factory.dtype)
            )
            continue

        if isinstance(factory, EventTimestamp) and factory.transformation is None:
            if event_ts is not None:
                raise ValueError(
                    f"view {name!r} declares multiple event timestamps"
                )
            event_ts = EventTimestampSchema(attr_name, factory.ttl_seconds)
            features.append(Feature(attr_name, factory.dtype))
            continue

        if isinstance(factory.transformation, _LazyHash):
            cols = [f._name or "" for f in factory.transformation.factories]
            derived[attr_name] = E.HashColumns(cols)
            derived_dtypes[attr_name] = factory.dtype
            continue

        if factory.transformation is not None:
            derived[attr_name] = resolve_refs(factory.transformation)
            derived_dtypes[attr_name] = factory.dtype
        else:
            features.append(Feature(attr_name, factory.dtype, factory._description))
            if factory._is_entity:
                entities.append(attr_name)

    return CompiledFeatureView(
        name=name,
        source=source,
        entities=entities,
        features=features,
        derived=derived,
        derived_dtypes=derived_dtypes,
        aggregations=aggregations,
        event_timestamp=event_ts,
        constraints=constraints,
        defaults=defaults,
        description=description or (cls.__doc__ or None),
        materialized_source=materialized_source,
        stream_source=stream_source,
        tags=tags,
    )


def load_feature(
    ref: str,
    entity_mapping: dict[str, str],
    dtype: FeatureType | None = None,
) -> FeatureFactory:
    """Cross-contract feature (reference ``for_entities``
    ``feature_factory.py:813`` → ``LoadFeature``
    ``transformation.py:3028-3081``): declare a feature fetched from
    another view, joining on ``entity_mapping`` (this view's column →
    target view's entity). List-typed keys explode/join/re-collect."""
    loc, _, feat = ref.partition(":")
    if not feat:
        raise ValueError(f"load_feature ref must be 'view:feature', got {ref!r}")
    out = _FACTORY_FOR_TYPE(dtype or FeatureType("float64"))
    out.transformation = E.LoadFeatureRef(
        view=loc, feature=feat, entity_mapping=dict(entity_mapping)
    )
    return out


def feature_view(
    name: str | None = None,
    source: Any = None,
    materialized_source: Any = None,
    stream_source: Any = None,
    description: str | None = None,
) -> Callable[[type], FeatureViewWrapper]:
    """``@feature_view`` decorator (reference
    ``aligned/feature_view/feature_view.py:673``)."""

    def decorator(cls: type) -> FeatureViewWrapper:
        view_name = name or cls.__name__.lower()
        compiled = _compile_view(
            cls,
            view_name,
            source,
            materialized_source,
            stream_source,
            description,
        )
        return FeatureViewWrapper(compiled, cls)

    return decorator


# ---------------------------------------------------------------------------
# model contracts


@dataclass
class CompiledModel:
    name: str
    input_references: list[FeatureReference]
    output_view: CompiledFeatureView | None
    predictor: Callable | None
    description: str | None = None


class ModelContractWrapper:
    def __init__(self, model: CompiledModel, cls: type):
        self.compiled = model
        self._cls = cls

    @property
    def name(self) -> str:
        return self.compiled.name


def model_contract(
    name: str | None = None,
    input_features: list[Any] | None = None,
    output_source: Any = None,
    predictor: Callable | None = None,
    description: str | None = None,
) -> Callable[[type], ModelContractWrapper]:
    """``@model_contract`` (reference ``aligned/compiler/model.py``).

    ``input_features``: FeatureFactory attrs of other compiled views
    (cross-view references) or ``"view:feature"`` strings.
    ``predictor``: fn(pandas.DataFrame) -> pandas.Series — applied as
    an Arrow-batched pandas UDF at ``predict_over`` time.
    """

    def decorator(cls: type) -> ModelContractWrapper:
        model_name = name or cls.__name__.lower()
        refs: list[FeatureReference] = []
        for item in input_features or []:
            if isinstance(item, str):
                refs.append(FeatureReference.parse(item))
            elif isinstance(item, FeatureFactory) and item._name:
                view_name = getattr(item, "_view_name", None)
                if view_name is None:
                    raise ValueError(
                        f"input feature {item._name!r} is not bound to a view; "
                        "pass a 'view:feature' string instead"
                    )
                refs.append(
                    FeatureReference(item._name, FeatureLocation(view_name))
                )
            else:
                raise ValueError(f"cannot use {item!r} as a model input feature")
        out_view = None
        if output_source is not None:
            out_view = _compile_view(cls, f"{model_name}_predictions", output_source)
        compiled = CompiledModel(
            name=model_name,
            input_references=refs,
            output_view=out_view,
            predictor=predictor,
            description=description or cls.__doc__,
        )
        return ModelContractWrapper(compiled, cls)

    return decorator
