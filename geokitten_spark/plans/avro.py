"""Minimal Apache Avro binary codec + Object Container File reader/writer.

Iceberg's manifest-list and manifest files are Avro Object Container
Files (Avro spec 1.11.x, https://avro.apache.org/docs/1.11.1/specification/);
the sandbox has no avro/fastavro package, so the Iceberg metadata reader
(plans/iceberg_meta.py) carries this small stdlib-only implementation —
the same hand-rolled-wire-format discipline as viz/mvt.py (protobuf) and
sources/warc.py (gzip members).

Supported schema features — the subset Iceberg metadata actually uses:
primitives (null, boolean, int, long, float, double, bytes, string),
record, array, map, union, fixed. Enums/logical-type decoration are
carried through as their underlying primitive. Codecs: ``null`` and
``deflate`` (raw zlib, per the spec).

Wire-format notes (asserted byte-for-byte in tests/test_iceberg_meta.py
against hand-assembled buffers, NOT just self-roundtrip):

* int/long: zigzag then base-128 little-endian varint;
* float/double: IEEE-754 little-endian 4/8 bytes;
* bytes/string: long length prefix + raw payload;
* union: long index of the branch, then the branch value;
* array/map: blocks of (long count, items...); a NEGATIVE count means
  ``abs(count)`` items preceded by a long byte-size (skippable blocks);
  a zero count terminates;
* container: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
  ``avro.codec``), 16-byte sync marker, then data blocks of
  (long n_records, long n_bytes, payload, sync).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

__all__ = [
    "read_avro_file",
    "write_avro_file",
    "decode_value",
    "encode_value",
]

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive binary codec
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    z &= (1 << 64) - 1
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
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # unzigzag


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode_value(buf: io.BytesIO, schema, value) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(
                f"fixed {schema.get('name')} wants {schema['size']} bytes,"
                f" got {len(data)}"
            )
        buf.write(data)
    elif t == "enum":
        _write_long(buf, schema["symbols"].index(value))
    elif t == "union":
        for idx, branch in enumerate(schema):
            if _union_match(branch, value):
                _write_long(buf, idx)
                encode_value(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    elif t == "array":
        if value:
            _write_long(buf, len(value))
            for item in value:
                encode_value(buf, schema["items"], item)
        _write_long(buf, 0)
    elif t == "map":
        if value:
            _write_long(buf, len(value))
            for k, v in value.items():
                _write_bytes(buf, k.encode("utf-8"))
                encode_value(buf, schema["values"], v)
        _write_long(buf, 0)
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] not in value:
                raise ValueError(
                    f"record {schema.get('name')} missing field {f['name']}"
                )
            encode_value(buf, f["type"], value[f["name"]])
    else:
        raise NotImplementedError(f"avro type {t!r}")


def _union_match(branch, value) -> bool:
    t = _schema_type(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "array":
        return isinstance(value, list)
    if t in ("map", "record"):
        return isinstance(value, dict)
    return False


def decode_value(buf, schema):
    t = _schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "union":
        return decode_value(buf, schema[_read_long(buf)])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)  # skippable-block byte size
                n = -n
            for _ in range(n):
                out.append(decode_value(buf, schema["items"]))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode_value(buf, schema["values"])
    if t == "record":
        return {
            f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]
        }
    raise NotImplementedError(f"avro type {t!r}")


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------


def write_avro_file(path: str, schema: dict, records: list,
                    *, codec: str = "deflate",
                    metadata: dict | None = None,
                    sync: bytes = b"\x00" * 16) -> None:
    """Write one Object Container File (all records in one block; Iceberg
    manifests are metadata-sized, not data-sized). ``sync`` is fixed by
    default so fixture files are byte-deterministic."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null|deflate, got {codec!r}")
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    body = io.BytesIO()
    for rec in records:
        encode_value(body, schema, rec)
    payload = body.getvalue()
    if codec == "deflate":
        # raw deflate (no zlib header), per the Avro spec
        payload = zlib.compress(payload, 9)[2:-4]
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    map_schema = {"type": "map", "values": "bytes"}
    encode_value(out, map_schema, meta)
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def read_avro_file(path: str) -> tuple[dict, dict, list]:
    """Read an Object Container File -> (schema, file_metadata, records)."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = decode_value(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records = []
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if len(block) != size:
            raise EOFError(f"{path}: truncated data block")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(decode_value(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
