"""Pure-Python protobuf wire-format codec for length-delimited logs.

Event streams very commonly land as length-delimited protobuf records
(the Kafka/gRPC lingua franca). The container's google.protobuf is
broken (verified ImportError) and there is no network, so the public
wire format (protobuf encoding spec: base-128 varints, tag =
field<<3 | wire_type, wire types 0/1/2/5) is implemented directly for
the flat message shape event logs use. The decoder is a general wire
parser: unknown fields are SKIPPED by wire type — the forward-
compatibility property that lets an old reader consume a new producer's
log (pinned by tests).

Framing: each record is prefixed by a varint byte length — the
standard streaming convention (``writeDelimitedTo``).

Used by ``queries/io_formats.py:io13_protobuf_log`` — distributed
write (one log file per task) and distributed read (binaryFile +
Arrow-batched decode). No code derived from any protobuf library.
"""

from __future__ import annotations

import struct


class ProtoError(ValueError):
    pass


# (field_number, name, kind); kind in {varint, double, str}
# proto3 presence: a None value is simply omitted from the record
EVENT_FIELDS = [
    (1, "event_id", "varint"),
    (2, "ts_micros", "varint"),
    (3, "user_id", "varint"),
    (4, "event_type", "str"),
    (5, "value", "double"),
    (6, "props", "str"),
]

_WT = {"varint": 0, "double": 1, "str": 2}


def write_varint(buf: bytearray, n: int) -> None:
    if n < 0:
        # standard int64 encoding: 10-byte two's-complement varint
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(data):
            raise ProtoError("truncated varint")
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            if acc >= 1 << 63:  # interpret as signed int64
                acc -= 1 << 64
            return acc, pos
        shift += 7
        if shift > 63:
            raise ProtoError("varint too long")


def encode_record(values: dict) -> bytes:
    """One message from a {name: value} dict; None values omitted."""
    buf = bytearray()
    for num, name, kind in EVENT_FIELDS:
        v = values.get(name)
        if v is None:
            continue
        write_varint(buf, (num << 3) | _WT[kind])
        if kind == "varint":
            write_varint(buf, int(v))
        elif kind == "double":
            buf += struct.pack("<d", float(v))
        else:
            raw = str(v).encode("utf-8")
            write_varint(buf, len(raw))
            buf += raw
    return bytes(buf)


def decode_record(data: bytes) -> dict:
    """Parse one message; unknown field numbers are skipped by wire
    type (forward compatibility)."""
    by_num = {num: (name, kind) for num, name, kind in EVENT_FIELDS}
    out: dict = {name: None for _n, name, _k in EVENT_FIELDS}
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = read_varint(data, pos)
        elif wt == 1:
            v = struct.unpack("<d", data[pos : pos + 8])[0]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(data, pos)
            v = data[pos : pos + ln]
            if len(v) != ln:
                raise ProtoError("truncated length-delimited field")
            pos += ln
        elif wt == 5:
            v = struct.unpack("<f", data[pos : pos + 4])[0]
            pos += 4
        else:
            raise ProtoError(f"unsupported wire type {wt}")
        if num in by_num:
            name, kind = by_num[num]
            if kind == "str" and isinstance(v, bytes):
                v = v.decode("utf-8")
            out[name] = v
        # else: unknown field skipped — already consumed above
    return out


def write_log(records: list[dict]) -> bytes:
    """Length-delimited record stream (writeDelimitedTo framing)."""
    buf = bytearray()
    for rec in records:
        body = encode_record(rec)
        write_varint(buf, len(body))
        buf += body
    return bytes(buf)


def read_log(data: bytes) -> list[dict]:
    out = []
    pos = 0
    while pos < len(data):
        ln, pos = read_varint(data, pos)
        if ln < 0 or pos + ln > len(data):
            raise ProtoError("truncated record")
        out.append(decode_record(data[pos : pos + ln]))
        pos += ln
    return out
