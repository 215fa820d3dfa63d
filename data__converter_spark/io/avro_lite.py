"""Minimal stdlib Avro Object Container File codec.

The positive-path half of the avro capability gate: Spark's avro
reader lives in the external ``org.apache.spark:spark-avro`` module,
which this environment does not ship. Like ``xlsx_lite`` (Excel) and
``MiniPdfCodec`` (PDF), this module implements enough of the public
format spec (Avro 1.11 binary encoding + OCF framing) in pure stdlib
to read and write real files: records of primitive fields (null,
boolean, int, long, float, double, string, bytes) and 2-branch
``["null", T]`` unions, ``null`` or ``deflate`` block codec.

Deliberately NOT a full Avro implementation — no nested records,
arrays, maps, enums, fixed, logical types, or schema resolution. The
reader raises ``ValueError`` on schemas outside this subset so a
deployment shipping spark-avro is never silently shadowed.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "string",
    "bytes",
}


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _zigzag_decode(acc)
        shift += 7


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    return buf.read(_read_long(buf))


# ---------------------------------------------------------------------------
# value encode/decode per schema type
# ---------------------------------------------------------------------------


def _normalize_type(t):
    """Field type -> ('prim', name) or ('union_null{i}', name) where i
    is the DECLARED index of the null branch (Avro encodes the branch
    index of the writer schema — ["double","null"] puts null at 1, and
    decoding it as if null were branch 0 desyncs the byte stream).
    Raises on anything beyond the supported subset."""
    if isinstance(t, str):
        if t not in _PRIMITIVES:
            raise ValueError(f"avro_lite: unsupported type {t!r}")
        return ("prim", t)
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) == 2 and "null" in t and len(branches) == 1 \
                and isinstance(branches[0], str) and branches[0] in _PRIMITIVES:
            return (f"union_null{t.index('null')}", branches[0])
        raise ValueError(f"avro_lite: unsupported union {t!r}")
    raise ValueError(f"avro_lite: unsupported complex type {t!r}")


def _encode_value(buf: io.BytesIO, kind, prim: str, v) -> None:
    if kind.startswith("union_null"):
        null_idx = int(kind[-1])
        if v is None:
            _write_long(buf, null_idx)
            return
        _write_long(buf, 1 - null_idx)
    elif v is None:
        if prim != "null":
            raise ValueError("null value for non-nullable field")
    if prim == "null":
        return
    if prim == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif prim in ("int", "long"):
        _write_long(buf, int(v))
    elif prim == "float":
        buf.write(struct.pack("<f", float(v)))
    elif prim == "double":
        buf.write(struct.pack("<d", float(v)))
    elif prim == "string":
        _write_bytes(buf, str(v).encode("utf-8"))
    elif prim == "bytes":
        _write_bytes(buf, bytes(v))


def _decode_value(buf, kind, prim: str):
    if kind.startswith("union_null"):
        null_idx = int(kind[-1])
        b = _read_long(buf)
        if b not in (0, 1):
            raise ValueError(f"avro_lite: corrupt union branch index {b}")
        if b == null_idx:
            return None
    if prim == "null":
        return None
    if prim == "boolean":
        return buf.read(1) != b"\x00"
    if prim in ("int", "long"):
        return _read_long(buf)
    if prim == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if prim == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if prim == "string":
        return _read_bytes(buf).decode("utf-8")
    if prim == "bytes":
        return _read_bytes(buf)
    raise ValueError(f"avro_lite: unsupported type {prim!r}")


def _record_fields(schema: dict):
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise ValueError("avro_lite: top-level schema must be a record")
    return [
        (f["name"], *_normalize_type(f["type"])) for f in schema["fields"]
    ]


# ---------------------------------------------------------------------------
# OCF writer / reader
# ---------------------------------------------------------------------------


def write_avro(
    path: str,
    records: list[dict],
    schema: dict,
    codec: str = "null",
    sync: bytes = b"avro_lite_sync16",
    meta: dict[str, bytes] | None = None,
) -> None:
    """Serialize ``records`` as one OCF block under ``schema``.
    ``meta`` adds extra header metadata entries (spec-legal arbitrary
    key/value pairs — also how tests exercise oversized headers)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_lite: unsupported codec {codec!r}")
    fields = _record_fields(schema)
    assert len(sync) == 16
    body = io.BytesIO()
    for rec in records:
        for name, kind, prim in fields:
            _encode_value(body, kind, prim, rec.get(name))
    payload = body.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
        **(meta or {}),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


class AvroHeaderTruncated(RuntimeError):
    """The OCF header continues past the bytes provided (e.g. a bounded
    driver-side peek ended before the sync marker).  Deliberately NOT a
    ``ValueError``: callers gate unsupported-schema ``ValueError``s into
    a NotImplementedError, and a too-small peek is neither unsupported
    nor corrupt — retry with a larger prefix."""


def _read_header(buf):
    """OCF header -> (schema dict, codec, sync marker); leaves ``buf``
    positioned at the first data block.  Raises
    :class:`AvroHeaderTruncated` when the data runs out before the
    header is fully parsed (giant metadata map vs a bounded peek)."""
    if buf.read(4) != MAGIC:
        raise ValueError("avro_lite: not an Avro object container file")
    meta: dict[str, bytes] = {}
    try:
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # negative count → block byte-size precedes entries
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode()
                meta[k] = _read_bytes(buf)
        schema = json.loads(meta["avro.schema"])
    except (ValueError, KeyError, UnicodeDecodeError) as e:
        # EOF mid-varint unpacks b"" (ValueError); a short _read_bytes
        # silently truncates and then json/decode fails, or the map loop
        # ends before avro.schema appears (KeyError).  Only call it
        # truncation when the buffer is in fact exhausted — a corrupt
        # header with bytes left propagates untouched.
        if buf.read(1) == b"":
            raise AvroHeaderTruncated(
                "avro_lite: OCF header extends past the bytes provided "
                "(metadata map larger than the peeked prefix); retry "
                "with a larger prefix"
            ) from e
        raise
    codec = meta.get("avro.codec", b"null").decode() or "null"
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro_lite: unsupported codec {codec!r}")
    sync = buf.read(16)
    if len(sync) != 16:
        raise AvroHeaderTruncated(
            "avro_lite: OCF header extends past the bytes provided "
            "(sync marker cut short); retry with a larger prefix"
        )
    return schema, codec, sync


def read_avro_schema(data: bytes) -> dict:
    """Header-only peek: OCF bytes -> schema dict (no record decode)."""
    return _read_header(io.BytesIO(data))[0]


def read_avro_bytes(data: bytes):
    """OCF bytes -> (schema dict, list of row dicts)."""
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    fields = _record_fields(schema)
    rows: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n_records = _read_long(buf)
        payload = buf.read(_read_long(buf))
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = io.BytesIO(payload)
        for _ in range(n_records):
            rows.append(
                {
                    name: _decode_value(block, kind, prim)
                    for name, kind, prim in fields
                }
            )
        if buf.read(16) != sync:
            raise ValueError("avro_lite: sync marker mismatch")
    return schema, rows


def spark_schema_of(schema: dict):
    """Avro record schema -> StructType for the distributed reader."""
    from pyspark.sql import types as T

    spark_types = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "null": T.NullType(),
    }
    out = []
    for name, kind, prim in _record_fields(schema):
        out.append(
            # Avro non-null fields are still nullable in Spark terms —
            # matching spark-avro, which maps them the same way
            (name, spark_types[prim])
        )
    from pyspark.sql.types import StructField, StructType

    return StructType([StructField(n, t, True) for n, t in out])
