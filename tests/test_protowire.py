"""Protobuf wire-format codec tests (formats/protowire.py): varint
int64 edges, null omission, unknown-field forward compatibility,
framing, rejections."""

from __future__ import annotations

import struct

import pytest

from aristoteles_spark.formats.protowire import (
    ProtoError,
    decode_record,
    encode_record,
    read_log,
    read_varint,
    write_log,
    write_varint,
)

REC = {
    "event_id": 42,
    "ts_micros": 1_700_000_000_000_000,
    "user_id": 7,
    "event_type": "click",
    "value": -1.5,
    "props": '{"k": 3, "s": "unicode ☃"}',
}


class TestVarint:
    @pytest.mark.parametrize(
        "n", [0, 1, 127, 128, 300, 2**31, 2**62, -1, -(2**63), 2**63 - 1]
    )
    def test_roundtrip_int64(self, n):
        buf = bytearray()
        write_varint(buf, n)
        v, pos = read_varint(bytes(buf), 0)
        assert v == n and pos == len(buf)

    def test_negative_is_ten_bytes(self):
        buf = bytearray()
        write_varint(buf, -1)
        assert len(buf) == 10  # standard int64 encoding

    def test_truncated(self):
        with pytest.raises(ProtoError, match="truncated"):
            read_varint(b"\x80\x80", 0)


class TestRecord:
    def test_roundtrip(self):
        assert decode_record(encode_record(REC)) == REC

    def test_none_fields_omitted_and_decode_as_none(self):
        rec = dict(REC, user_id=None, value=None, props=None)
        data = encode_record(rec)
        assert len(data) < len(encode_record(REC))
        assert decode_record(data) == rec

    def test_unknown_fields_skipped(self):
        """Forward compatibility: a producer adds fields 7 (varint),
        8 (double), 9 (string) — an old reader must skip them."""
        data = bytearray(encode_record(REC))
        extra = bytearray()
        write_varint(extra, (7 << 3) | 0)
        write_varint(extra, 999)
        write_varint(extra, (8 << 3) | 1)
        extra += struct.pack("<d", 3.14)
        write_varint(extra, (9 << 3) | 2)
        write_varint(extra, 3)
        extra += b"new"
        assert decode_record(bytes(data + extra)) == REC

    def test_unsupported_wire_type(self):
        bad = bytearray()
        write_varint(bad, (7 << 3) | 3)  # deprecated group start
        with pytest.raises(ProtoError, match="wire type"):
            decode_record(bytes(bad))


class TestLog:
    def test_log_roundtrip(self):
        recs = [dict(REC, event_id=i, user_id=None if i % 3 else i)
                for i in range(200)]
        assert read_log(write_log(recs)) == recs

    def test_truncated_log(self):
        data = write_log([REC])
        with pytest.raises(ProtoError):
            read_log(data[:-3])

    def test_deterministic(self):
        assert write_log([REC] * 5) == write_log([REC] * 5)
