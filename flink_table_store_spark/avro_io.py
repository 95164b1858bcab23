"""Minimal pure-Python Avro object-container-file writer/reader.

The Iceberg compatibility layer (iceberg.py) writes manifest and
manifest-list files, which the Iceberg spec fixes as Avro object
container files. The runtime has no Avro library (and Spark's avro
data source is not on the classpath), so this module implements the
subset of the Avro 1.11 spec the Iceberg metadata schemas need:

- types: null, boolean, int, long, float, double, bytes, string,
  record, array, map, union, fixed (enum not required);
- object container file framing: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` + ``avro.codec``), 16-byte sync marker, data blocks
  (count, byte-size, payload, sync); writes the ``null`` codec, reads
  ``null`` and ``deflate`` (external Iceberg writers compress
  manifests by default).

Encoding is schema-driven: ``write_container(path, schema, records)``
takes the Avro schema as a JSON-able dict and plain Python values
(records = dicts, arrays = lists, maps = dicts, unions resolved by
value). ``read_container(path)`` returns (schema, records) and is used
both by tests (round-trip property tests) and by the ``$iceberg``
system view. Attribute keys like ``field-id`` that Iceberg adds to the
schema JSON are carried through untouched — Avro readers ignore
unknown attributes by spec.

This is an independent implementation from the public Avro format
specification; the reference's serializers
(paimon-format/.../avro/, IcebergManifestFileMetaSerializer.java) are
behavioral guides only.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes valid)


# --------------------------------------------------------------------------
# primitive encoders
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, data: bytes) -> None:
    write_long(buf, len(data))
    buf.write(data)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


# --------------------------------------------------------------------------
# schema-driven value encoding
# --------------------------------------------------------------------------


def _schema_type(schema: Any) -> Any:
    """Normalize {'type': 'string', ...} / 'string' / union-list forms."""
    if isinstance(schema, dict) and schema.get("type") in (
        "record",
        "array",
        "map",
        "fixed",
        "enum",
    ):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def encode(buf: io.BytesIO, schema: Any, value: Any) -> None:
    s = _schema_type(schema)
    if isinstance(s, list):  # union: resolve branch by value
        idx, branch = _resolve_union(s, value)
        write_long(buf, idx)
        encode(buf, branch, value)
        return
    if isinstance(s, dict):
        t = s["type"]
        if t == "record":
            for f in s["fields"]:
                try:
                    encode(buf, f["type"], value.get(f["name"]))
                except Exception as e:  # re-raise with field context
                    raise ValueError(f"field {f['name']!r}: {e}") from e
            return
        if t == "array":
            items = list(value or [])
            if items:
                write_long(buf, len(items))
                for v in items:
                    encode(buf, s["items"], v)
            write_long(buf, 0)
            return
        if t == "map":
            entries = dict(value or {})
            if entries:
                write_long(buf, len(entries))
                for k, v in entries.items():
                    write_bytes(buf, str(k).encode("utf-8"))
                    encode(buf, s["values"], v)
            write_long(buf, 0)
            return
        if t == "fixed":
            if len(value) != s["size"]:
                raise ValueError(f"fixed size mismatch: {len(value)} != {s['size']}")
            buf.write(bytes(value))
            return
        raise ValueError(f"unsupported complex type {t}")
    # primitives
    if s == "null":
        if value is not None:
            raise ValueError("non-null value for null schema")
        return
    if s == "boolean":
        buf.write(b"\x01" if value else b"\x00")
        return
    if s in ("int", "long"):
        write_long(buf, int(value))
        return
    if s == "float":
        buf.write(struct.pack("<f", float(value)))
        return
    if s == "double":
        buf.write(struct.pack("<d", float(value)))
        return
    if s == "bytes":
        write_bytes(buf, bytes(value))
        return
    if s == "string":
        write_bytes(buf, str(value).encode("utf-8"))
        return
    raise ValueError(f"unsupported type {s!r}")


def _resolve_union(branches: list, value: Any) -> tuple[int, Any]:
    """Pick the union branch for a plain Python value (null vs other)."""
    for i, b in enumerate(branches):
        bt = _schema_type(b)
        if value is None and bt == "null":
            return i, b
        if value is not None and bt != "null":
            return i, b
    raise ValueError(f"no union branch for {value!r} in {branches!r}")


def decode(buf: io.BytesIO, schema: Any) -> Any:
    s = _schema_type(schema)
    if isinstance(s, list):
        return decode(buf, s[read_long(buf)])
    if isinstance(s, dict):
        t = s["type"]
        if t == "record":
            return {f["name"]: decode(buf, f["type"]) for f in s["fields"]}
        if t == "array":
            out = []
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    read_long(buf)
                    n = -n
                out.extend(decode(buf, s["items"]) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    read_long(buf)
                    n = -n
                for _ in range(n):
                    k = read_bytes(buf).decode("utf-8")
                    out[k] = decode(buf, s["values"])
        if t == "fixed":
            return buf.read(s["size"])
        raise ValueError(f"unsupported complex type {t}")
    if s == "null":
        return None
    if s == "boolean":
        return buf.read(1) == b"\x01"
    if s in ("int", "long"):
        return read_long(buf)
    if s == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if s == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if s == "bytes":
        return read_bytes(buf)
    if s == "string":
        return read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported type {s!r}")


# --------------------------------------------------------------------------
# object container file
# --------------------------------------------------------------------------


def write_container(path: str, schema: dict, records: list, codec: str = "null") -> int:
    """Write an Avro object container file; returns its byte length."""
    if codec != "null":
        raise ValueError("only the null codec is supported")
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode("utf-8"),
        "avro.codec": b"null",
    }
    write_long(buf, len(meta))
    for k, v in meta.items():
        write_bytes(buf, k.encode("utf-8"))
        write_bytes(buf, v)
    write_long(buf, 0)
    buf.write(SYNC)
    if records:
        block = io.BytesIO()
        for r in records:
            encode(block, schema, r)
        payload = block.getvalue()
        write_long(buf, len(records))
        write_long(buf, len(payload))
        buf.write(payload)
        buf.write(SYNC)
    data = buf.getvalue()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_container(path: str) -> tuple[dict, list]:
    """Read an Avro object container file written by any conforming
    writer (null codec); returns (schema, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null") or b"null"
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = buf.read(16)
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        payload = buf.read(size)
        if codec == b"deflate":  # raw RFC-1951 stream (Avro spec)
            import zlib

            payload = zlib.decompress(payload, wbits=-15)
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(decode(block, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records
