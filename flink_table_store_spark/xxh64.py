"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Implements the public xxHash64 algorithm with the same per-type input
normalization Spark applies (XxHash64 hashes ints as 4-byte values,
longs/timestamps/doubles as 8-byte, strings as their UTF-8 bytes, and
chains multiple arguments by feeding each field's hash in as the next
field's seed, starting from seed 42). Lets the scan planner compute
bloom-index positions for predicate literals without launching a Spark
job; tests/test_fileindex.py property-checks every supported type
against Spark's own xxhash64 output.
"""

from __future__ import annotations

import datetime
import struct
from typing import Any

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def hash_int(value: int, seed: int) -> int:
    """4-byte input (Spark int/short/byte/date/float-bits/boolean)."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = (_rotl(h, 23) * _P2 + _P3) & _MASK
    return _fmix(h)


def hash_long(value: int, seed: int) -> int:
    """8-byte input (Spark long/timestamp/double-bits/small decimal)."""
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl(((value & _MASK) * _P2) & _MASK, 31) * _P1) & _MASK
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def _merge_round(h: int, v: int) -> int:
    v = (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
    h ^= v
    h = (h * _P1 + _P4) & _MASK
    return h


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte buffer (Spark hashUnsafeBytes)."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while off <= length - 32:
            for i, v in enumerate((v1, v2, v3, v4)):
                (k,) = struct.unpack_from("<q", data, off + 8 * i)
                v = (v + (k & _MASK) * _P2) & _MASK
                v = (_rotl(v, 31) * _P1) & _MASK
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + length) & _MASK
    while off <= length - 8:
        (k,) = struct.unpack_from("<q", data, off)
        h ^= (_rotl(((k & _MASK) * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        off += 8
    if off <= length - 4:
        (k4,) = struct.unpack_from("<i", data, off)
        h ^= ((k4 & 0xFFFFFFFF) * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        off += 1
    return _fmix(h)


_EPOCH = datetime.date(1970, 1, 1)

# DDL type -> normalizer returning ("int"|"long"|"bytes", normalized value);
# None return = unsupported (caller falls back to a Spark job)
def _normalize(value: Any, ddl: str):
    t = ddl.strip().lower()
    if t in ("bigint", "long"):
        return "long", int(value)
    if t in ("int", "integer", "smallint", "short", "tinyint", "byte"):
        return "int", int(value)
    if t in ("string", "varchar", "char") or t.startswith(("varchar(", "char(")):
        return "bytes", str(value).encode("utf-8")
    if t == "boolean":
        return "int", 1 if value else 0
    if t == "date":
        d = value if isinstance(value, datetime.date) else datetime.date.fromisoformat(str(value))
        return "int", (d - _EPOCH).days
    if t == "double":
        bits = struct.unpack("<q", struct.pack("<d", float(value)))[0]
        # Spark normalizes -0.0 to 0.0 before hashing
        if float(value) == 0.0:
            bits = 0
        return "long", bits
    if t == "float":
        bits = struct.unpack("<i", struct.pack("<f", float(value)))[0]
        if float(value) == 0.0:
            bits = 0
        return "int", bits
    if t in ("timestamp", "timestamp_ltz", "timestamp_ntz"):
        if isinstance(value, datetime.datetime):
            dt = value
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=datetime.timezone.utc)
            delta = dt - datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            return "long", delta // datetime.timedelta(microseconds=1)
        return None
    return None


def spark_xxhash64(values_types: list[tuple[Any, str]]) -> int | None:
    """Spark ``xxhash64(v1, v2, ...)``: each field hashed with the running
    hash as its seed. Returns the signed 64-bit result, or None when any
    value's type isn't supported here (caller uses the Spark fallback)."""
    h = SEED
    for value, ddl in values_types:
        norm = _normalize(value, ddl)
        if norm is None:
            return None
        kind, v = norm
        if kind == "int":
            h = hash_int(v, h)
        elif kind == "long":
            h = hash_long(v, h)
        else:
            h = hash_bytes(v, h)
    return h - (1 << 64) if h >= (1 << 63) else h
