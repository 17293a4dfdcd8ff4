"""Feature type system with an authoritative Spark mapping.

Mirrors the reference's name-encoded type system
(``aligned/schemas/feature.py:72-75`` — parametric types packed into
the name: ``datetime-<tz>``, ``array-<subtype>``,
``embedding-<size>``, ``struct-{json}``) and adopts its Spark mapping
(``aligned/schemas/feature.py:198-269``) with two deliberate fixes:

- ``time``/``timedelta`` (unmapped in the reference's ``spark_type``)
  map to ``LongType`` microseconds / ``DayTimeIntervalType``.
- unsigned ints map to their signed Spark container (documented lossy
  at the top bit, same compromise the reference makes at
  ``feature.py:250-253``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import types as T

_PRIMITIVES = {
    "string",
    "int8",
    "int16",
    "int32",
    "int64",
    "uint8",
    "uint16",
    "uint32",
    "uint64",
    "float32",
    "float64",
    "bool",
    "date",
    "datetime",
    "time",
    "timedelta",
    "uuid",
    "json",
    "binary",
    "array",
    "struct",
    "embedding",
}

_SIMPLE_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    # Spark has no unsigned ints; signed containers (lossy top bit).
    "uint8": T.ByteType(),
    "uint16": T.ShortType(),
    "uint32": T.IntegerType(),
    "uint64": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "bool": T.BooleanType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "time": T.LongType(),  # microseconds since midnight
    "timedelta": T.DayTimeIntervalType(),
}


@dataclass(frozen=True)
class FeatureType:
    """A named data type; parametric params are packed into the name."""

    name: str

    # --- constructors -------------------------------------------------
    @staticmethod
    def string() -> "FeatureType":
        return FeatureType("string")

    @staticmethod
    def int8() -> "FeatureType":
        return FeatureType("int8")

    @staticmethod
    def int16() -> "FeatureType":
        return FeatureType("int16")

    @staticmethod
    def int32() -> "FeatureType":
        return FeatureType("int32")

    @staticmethod
    def int64() -> "FeatureType":
        return FeatureType("int64")

    @staticmethod
    def float32() -> "FeatureType":
        return FeatureType("float32")

    @staticmethod
    def float64() -> "FeatureType":
        return FeatureType("float64")

    @staticmethod
    def boolean() -> "FeatureType":
        return FeatureType("bool")

    @staticmethod
    def date() -> "FeatureType":
        return FeatureType("date")

    @staticmethod
    def datetime(tz: str | None = "UTC") -> "FeatureType":
        return FeatureType(f"datetime-{tz}" if tz else "datetime")

    @staticmethod
    def uuid() -> "FeatureType":
        return FeatureType("uuid")

    @staticmethod
    def json() -> "FeatureType":
        return FeatureType("json")

    @staticmethod
    def binary() -> "FeatureType":
        return FeatureType("binary")

    @staticmethod
    def array(subtype: "FeatureType | None" = None) -> "FeatureType":
        if subtype is None:
            return FeatureType("array")
        return FeatureType(f"array-{subtype.name}")

    @staticmethod
    def embedding(size: int) -> "FeatureType":
        return FeatureType(f"embedding-{size}")

    @staticmethod
    def struct(fields: dict[str, "FeatureType"] | None = None) -> "FeatureType":
        if not fields:
            return FeatureType("struct")
        payload = json.dumps({k: v.name for k, v in sorted(fields.items())})
        return FeatureType(f"struct-{payload}")

    # --- accessors -----------------------------------------------------
    @property
    def base_name(self) -> str:
        for prefix in ("datetime-", "array-", "embedding-", "struct-"):
            if self.name.startswith(prefix):
                return prefix[:-1]
        return self.name

    @property
    def is_numeric(self) -> bool:
        return self.base_name in {
            "int8",
            "int16",
            "int32",
            "int64",
            "uint8",
            "uint16",
            "uint32",
            "uint64",
            "float32",
            "float64",
        }

    @property
    def is_datetime(self) -> bool:
        return self.base_name == "datetime"

    @property
    def is_array(self) -> bool:
        return self.base_name in {"array", "embedding"}

    @property
    def array_subtype(self) -> "FeatureType":
        if self.name.startswith("array-"):
            return FeatureType(self.name[len("array-") :])
        if self.name.startswith("embedding-"):
            return FeatureType("float32")
        return FeatureType("string")

    @property
    def embedding_size(self) -> int | None:
        if self.name.startswith("embedding-"):
            return int(self.name[len("embedding-") :])
        return None

    @property
    def datetime_timezone(self) -> str | None:
        if self.name.startswith("datetime-"):
            return self.name[len("datetime-") :]
        return None

    # --- Spark mapping ---------------------------------------------------
    @property
    def spark_type(self) -> T.DataType:
        name = self.name
        if name in _SIMPLE_SPARK:
            return _SIMPLE_SPARK[name]
        if name == "datetime" or name.startswith("datetime-"):
            # Session tz is pinned to UTC; Spark TimestampType is
            # session-tz-relative so tz info is normalized, not stored.
            return T.TimestampType()
        if name == "array":
            return T.ArrayType(T.StringType())
        if name.startswith("array-"):
            return T.ArrayType(self.array_subtype.spark_type)
        if name.startswith("embedding-"):
            return T.ArrayType(T.FloatType())
        if name == "struct":
            return T.MapType(T.StringType(), T.StringType())
        if name.startswith("struct-"):
            fields = json.loads(name[len("struct-") :])
            return T.StructType(
                [
                    T.StructField(fname, FeatureType(ftype).spark_type, True)
                    for fname, ftype in sorted(fields.items())
                ]
            )
        raise ValueError(f"unknown feature type: {name!r}")

    @staticmethod
    def from_spark(dtype: T.DataType) -> "FeatureType":
        """Infer a FeatureType from a Spark type (schema discovery)."""
        if isinstance(dtype, T.StringType):
            return FeatureType("string")
        if isinstance(dtype, T.ByteType):
            return FeatureType("int8")
        if isinstance(dtype, T.ShortType):
            return FeatureType("int16")
        if isinstance(dtype, T.IntegerType):
            return FeatureType("int32")
        if isinstance(dtype, T.LongType):
            return FeatureType("int64")
        if isinstance(dtype, T.FloatType):
            return FeatureType("float32")
        if isinstance(dtype, T.DoubleType):
            return FeatureType("float64")
        if isinstance(dtype, T.BooleanType):
            return FeatureType("bool")
        if isinstance(dtype, T.DateType):
            return FeatureType("date")
        if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
            return FeatureType("datetime-UTC")
        if isinstance(dtype, T.BinaryType):
            return FeatureType("binary")
        if isinstance(dtype, T.DecimalType):
            return FeatureType("float64")
        if isinstance(dtype, T.ArrayType):
            return FeatureType.array(FeatureType.from_spark(dtype.elementType))
        if isinstance(dtype, T.MapType):
            return FeatureType("struct")
        if isinstance(dtype, T.StructType):
            return FeatureType.struct(
                {f.name: FeatureType.from_spark(f.dataType) for f in dtype.fields}
            )
        if isinstance(dtype, T.DayTimeIntervalType):
            return FeatureType("timedelta")
        raise ValueError(f"cannot infer FeatureType from {dtype}")


@dataclass(frozen=True)
class Feature:
    """A named, typed column in a contract."""

    name: str
    dtype: FeatureType
    description: str | None = None
    tags: tuple[str, ...] = ()


@dataclass(frozen=True)
class FeatureLocation:
    """Where a feature lives: a feature view or a model's predictions."""

    name: str
    location_type: str = "feature_view"  # feature_view | model

    def identifier(self) -> str:
        return f"{self.location_type}:{self.name}"


@dataclass(frozen=True)
class FeatureReference:
    """``view:feature`` cross-contract pointer."""

    name: str
    location: FeatureLocation

    def identifier(self) -> str:
        return f"{self.location.name}:{self.name}"

    @staticmethod
    def parse(ref: str) -> "FeatureReference":
        parts = ref.split(":")
        if len(parts) == 2:
            return FeatureReference(parts[1], FeatureLocation(parts[0]))
        if len(parts) == 3:
            return FeatureReference(parts[2], FeatureLocation(parts[1], parts[0]))
        raise ValueError(f"invalid feature reference {ref!r}")


@dataclass(frozen=True)
class EventTimestamp:
    """Row-validity timestamp used by point-in-time semantics.

    ``ttl_seconds``: optional max lookback — a feature row older than
    ``fact_ts - ttl`` is not served (reference: ttl on EventTimestamp,
    ``aligned/schemas/feature.py:606-629``).
    """

    name: str
    ttl_seconds: int | None = None
    dtype: FeatureType = FeatureType("datetime-UTC")
