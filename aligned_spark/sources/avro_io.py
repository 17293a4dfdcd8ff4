"""Minimal Apache Avro binary codec (pure Python).

Iceberg's metadata layer (manifest lists and manifest files) is Avro
Object Container Files; this container has neither the Python ``avro``
package nor the spark-avro jar, so this module implements the small
subset of the PUBLIC Avro 1.11 specification
(avro.apache.org/docs/1.11.1/specification/) those files need:

- primitives: null, boolean, int, long (zig-zag varint), float,
  double, bytes, string;
- complex: record, array, map, union (encoded as zig-zag branch
  index + value), fixed;
- logical types pass through as their underlying primitives;
- Object Container File framing: magic ``Obj\\x01``, metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker,
  blocks of (count, byte-length, data, sync). Codec: ``null`` only
  (deflate unnecessary for metadata-sized files).

Schemas are plain parsed-JSON dicts in Avro schema syntax. The codec
is self-contained and bidirectional, so everything written here reads
back byte-exactly; it intentionally omits what Iceberg metadata never
uses (enums, recursive types, aliases, schema resolution between
differing reader/writer schemas).
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any

MAGIC = b"Obj\x01"


# ------------------------------------------------------------ encode


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _union_branch(schema: list, value: Any) -> tuple[int, Any]:
    """Pick the union branch for ``value``: None matches "null",
    anything else the first non-null branch (the only union shape
    Iceberg metadata uses: optional fields)."""
    for i, br in enumerate(schema):
        if br == "null" and value is None:
            return i, br
    for i, br in enumerate(schema):
        if br != "null":
            return i, br
    raise ValueError(f"no union branch for {value!r} in {schema!r}")


def write_datum(buf: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union
        idx, br = _union_branch(schema, value)
        _write_long(buf, idx)
        write_datum(buf, br, value)
        return
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return
    if stype == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif stype in ("int", "long"):
        _write_long(buf, int(value))
    elif stype == "float":
        buf.write(struct.pack("<f", float(value)))
    elif stype == "double":
        buf.write(struct.pack("<d", float(value)))
    elif stype == "bytes":
        _write_bytes(buf, bytes(value))
    elif stype == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif stype == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(b)
    elif stype == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                write_datum(buf, f["type"], value[f["name"]])
            elif "default" in f or (
                isinstance(f["type"], list) and "null" in f["type"]
            ):
                write_datum(buf, f["type"], f.get("default"))
            else:
                raise ValueError(
                    f"missing required field {f['name']!r}"
                )
    elif stype == "array":
        items = list(value or [])
        if items:
            _write_long(buf, len(items))
            for it in items:
                write_datum(buf, schema["items"], it)
        _write_long(buf, 0)
    elif stype == "map":
        entries = dict(value or {})
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                write_datum(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type: {stype!r}")


# ------------------------------------------------------------ decode


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    out = buf.read(n)
    if len(out) != n:
        raise EOFError("truncated bytes")
    return out


def read_datum(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return read_datum(buf, schema[idx])
    stype = schema["type"] if isinstance(schema, dict) else schema
    if stype == "null":
        return None
    if stype == "boolean":
        return buf.read(1) == b"\x01"
    if stype in ("int", "long"):
        return _read_long(buf)
    if stype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if stype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if stype == "bytes":
        return _read_bytes(buf)
    if stype == "string":
        return _read_bytes(buf).decode("utf-8")
    if stype == "fixed":
        return buf.read(schema["size"])
    if stype == "record":
        return {
            f["name"]: read_datum(buf, f["type"])
            for f in schema["fields"]
        }
    if stype == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
    if stype == "map":
        out: dict[str, Any] = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
    raise ValueError(f"unsupported Avro type: {stype!r}")


# -------------------------------------------- object container files


def write_container(
    path: str,
    schema: dict[str, Any],
    records: list[dict[str, Any]],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro Object Container File; returns its byte size.
    Sync marker derived deterministically from the content hash so
    identical writes are byte-identical (replay-friendly)."""
    import hashlib

    body = io.BytesIO()
    for rec in records:
        write_datum(body, schema, rec)
    data = body.getvalue()
    sync = hashlib.md5(
        json.dumps(schema, sort_keys=True).encode() + data
    ).digest()

    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema),
        "avro.codec": "null",
        **(metadata or {}),
    }
    meta_schema = {"type": "map", "values": "bytes"}
    write_datum(
        buf, meta_schema, {k: v.encode("utf-8") for k, v in meta.items()}
    )
    buf.write(sync)
    if records:
        _write_long(buf, len(records))
        _write_long(buf, len(data))
        buf.write(data)
        buf.write(sync)
    out = buf.getvalue()
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(out)
    os.replace(tmp, path)
    return len(out)


def read_container(path: str) -> tuple[dict[str, Any], list[Any]]:
    """Read an Object Container File → (schema, records)."""
    with open(path, "rb") as fh:
        buf = io.BytesIO(fh.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta = read_datum(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec: {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(read_datum(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records
