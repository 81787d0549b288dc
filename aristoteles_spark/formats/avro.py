"""Pure-Python Avro Object Container File writer + reader.

The container's pyspark ships Avro's core jars only as transitive
dependencies — the `spark-avro` DataSource module is absent and the
environment has no network — so, as with `formats/minihdf5.py`, the
public specification (Avro 1.12, "Object Container Files" + "Binary
encoding") is implemented directly:

- zigzag varint longs/ints, IEEE little-endian float/double, length-
  prefixed string/bytes, index-prefixed unions (nullable = ["null", T]);
- container framing: `Obj\\x01` magic, file-metadata map
  (`avro.schema` JSON, `avro.codec`), 16-byte sync marker, then blocks
  of (record count, byte length, payload, sync);
- codecs: `null` and `deflate` (raw RFC-1951 via zlib, per spec).

Schemas are records of primitives with optional nullability; the
`timestamp-micros` logical type annotates longs. This is the subset
landing-zone event data actually uses — nested records/arrays/maps
raise cleanly.

Used by `queries/io_formats.py:io10_avro_roundtrip`: write from
executors (one container file per partition), read via binaryFile +
Arrow-batched decode — distributed both ways, like the tar shard path.

Reference scope note: the reference ingests only SQLite
(aristoteles/aristoteles.py:318-343); this serves the engine's
landing-zone format surface (SURVEY.md §7.4). No code derived from any
Avro library.
"""

from __future__ import annotations

import json
import os
import struct
import zlib


class AvroError(ValueError):
    pass


MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "string", "bytes"}


# ------------------------------------------------------------ primitives


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if pos >= len(data):
            raise AvroError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7
        if shift > 63:
            raise AvroError("varint too long")


def _write_value(buf: bytearray, typ: str, v) -> None:
    if typ == "null":
        if v is not None:
            raise AvroError("non-null value for null type")
    elif typ == "boolean":
        buf.append(1 if v else 0)
    elif typ in ("int", "long"):
        write_long(buf, int(v))
    elif typ == "float":
        buf += struct.pack("<f", float(v))
    elif typ == "double":
        buf += struct.pack("<d", float(v))
    elif typ == "string":
        raw = str(v).encode("utf-8")
        write_long(buf, len(raw))
        buf += raw
    elif typ == "bytes":
        write_long(buf, len(v))
        buf += bytes(v)
    else:
        raise AvroError(f"unsupported type {typ!r}")


def _read_value(data: bytes, pos: int, typ: str):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return data[pos] != 0, pos + 1
    if typ in ("int", "long"):
        return read_long(data, pos)
    if typ == "float":
        return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
    if typ == "double":
        return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
    if typ == "string":
        n, pos = read_long(data, pos)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if typ == "bytes":
        n, pos = read_long(data, pos)
        return bytes(data[pos : pos + n]), pos + n
    raise AvroError(f"unsupported type {typ!r}")


# ---------------------------------------------------------------- schema


def _field_branches(ftype) -> list[str]:
    """Normalize a field type to its union branches (possibly length 1).
    Accepts a primitive name, {'type': prim, 'logicalType': ...}, or a
    union list of those."""
    if isinstance(ftype, str):
        branches = [ftype]
    elif isinstance(ftype, dict):
        branches = [ftype["type"]]
    elif isinstance(ftype, list):
        branches = []
        for t in ftype:
            branches.append(t if isinstance(t, str) else t["type"])
    else:
        raise AvroError(f"unsupported field type {ftype!r}")
    for b in branches:
        if b not in _PRIMITIVES:
            raise AvroError(
                f"unsupported type {b!r} (records of primitives only)"
            )
    return branches


def _parse_schema(schema: dict) -> list[tuple[str, list[str]]]:
    if schema.get("type") != "record":
        raise AvroError("top-level schema must be a record")
    return [(f["name"], _field_branches(f["type"])) for f in schema["fields"]]


# ------------------------------------------------------------- container


def write_avro(
    schema: dict,
    rows: list[tuple],
    codec: str = "null",
    sync: bytes | None = None,
    block_records: int = 1000,
) -> bytes:
    """Serialize rows (tuples in schema field order) into an Object
    Container File. ``sync`` must be 16 bytes when given (deterministic
    files for tests); defaults to a digest of the schema."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    fields = _parse_schema(schema)
    if sync is None:
        import hashlib

        sync = hashlib.md5(
            json.dumps(schema, sort_keys=True).encode()
        ).digest()
    if len(sync) != 16:
        raise AvroError("sync marker must be 16 bytes")

    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_long(out, len(meta))
    for k, v in sorted(meta.items()):
        _write_value(out, "string", k)
        _write_value(out, "bytes", v)
    write_long(out, 0)  # end of metadata map
    out += sync

    for start in range(0, len(rows), block_records):
        chunk = rows[start : start + block_records]
        payload = bytearray()
        for row in chunk:
            if len(row) != len(fields):
                raise AvroError("row arity != schema fields")
            for v, (_name, branches) in zip(row, fields):
                if len(branches) > 1:
                    idx = (
                        branches.index("null")
                        if v is None
                        else next(
                            i for i, b in enumerate(branches) if b != "null"
                        )
                    )
                    write_long(payload, idx)
                    _write_value(payload, branches[idx], v)
                else:
                    _write_value(payload, branches[0], v)
        body = bytes(payload)
        if codec == "deflate":  # raw RFC-1951 stream, per the Avro spec
            co = zlib.compressobj(9, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        write_long(out, len(chunk))
        write_long(out, len(body))
        out += body
        out += sync
    return bytes(out)


def read_avro(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse an Object Container File -> (schema, rows as tuples in
    field order). Verifies magic, codec, and every block's sync
    marker."""
    if data[:4] != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(data, pos)
        if n == 0:
            break
        if n < 0:  # negative count means a byte-size prefix follows
            _, pos = read_long(data, pos)
            n = -n
        for _ in range(n):
            k, pos = _read_value(data, pos, "string")
            v, pos = _read_value(data, pos, "bytes")
            meta[k] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    fields = _parse_schema(schema)
    sync = data[pos : pos + 16]
    pos += 16

    rows: list[tuple] = []
    while pos < len(data):
        count, pos = read_long(data, pos)
        size, pos = read_long(data, pos)
        body = data[pos : pos + size]
        pos += size
        if data[pos : pos + 16] != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        bpos = 0
        for _ in range(count):
            row = []
            for _name, branches in fields:
                if len(branches) > 1:
                    idx, bpos = read_long(body, bpos)
                    if not 0 <= idx < len(branches):
                        raise AvroError("union index out of range")
                    v, bpos = _read_value(body, bpos, branches[idx])
                else:
                    v, bpos = _read_value(body, bpos, branches[0])
                row.append(v)
            rows.append(tuple(row))
        if bpos != len(body):
            raise AvroError("trailing bytes in block")
    return schema, rows


# -------------------------------------------------- events-table schema

EVENTS_AVRO_SCHEMA = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {
            "name": "ts",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
        {"name": "user_id", "type": ["null", "long"]},
        {"name": "event_type", "type": ["null", "string"]},
        {"name": "value", "type": ["null", "double"]},
        {"name": "props", "type": ["null", "string"]},
    ],
}


def avro_path_rows(path: str) -> tuple[dict, list[tuple]]:
    with open(path, "rb") as f:
        return read_avro(f.read())


def write_avro_file(path: str, schema: dict, rows: list[tuple],
                    codec: str = "null") -> None:
    tmp = path + ".inprogress"
    with open(tmp, "wb") as f:
        f.write(write_avro(schema, rows, codec=codec))
    os.replace(tmp, path)


__all__ = [
    "AvroError",
    "EVENTS_AVRO_SCHEMA",
    "MAGIC",
    "avro_path_rows",
    "read_avro",
    "read_long",
    "write_avro",
    "write_avro_file",
    "write_long",
]
