"""Avro object-container codec tests (formats/avro.py): varint/zigzag
edges, null-union handling, both codecs, block framing + sync-marker
verification, and structural rejections."""

from __future__ import annotations

import json

import pytest

from aristoteles_spark.formats.avro import (
    MAGIC,
    AvroError,
    read_avro,
    read_long,
    write_avro,
    write_long,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"]},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": "boolean"},
    ],
}

ROWS = [
    (0, "x", 1.5, True),
    (-1, None, None, False),
    (2**62, "unicode £ ☃", -0.0, True),
    (-(2**62), "", 1e300, False),
]


class TestVarint:
    @pytest.mark.parametrize(
        "n", [0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**63)]
    )
    def test_long_roundtrip(self, n):
        buf = bytearray()
        write_long(buf, n)
        v, pos = read_long(bytes(buf), 0)
        assert v == n and pos == len(buf)

    def test_zigzag_small_values_one_byte(self):
        for n in (0, -1, 1, -2, 2):
            buf = bytearray()
            write_long(buf, n)
            assert len(buf) == 1

    def test_truncated_varint_raises(self):
        with pytest.raises(AvroError, match="truncated"):
            read_long(b"\x80", 0)


class TestContainer:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip(self, codec):
        data = write_avro(SCHEMA, ROWS, codec=codec)
        assert data[:4] == MAGIC
        schema, rows = read_avro(data)
        assert schema == SCHEMA
        assert rows == ROWS

    def test_multi_block(self):
        rows = [(i, f"s{i}", float(i), i % 2 == 0) for i in range(2500)]
        data = write_avro(SCHEMA, rows, codec="deflate", block_records=100)
        _, back = read_avro(data)
        assert back == rows

    def test_deterministic_bytes(self):
        a = write_avro(SCHEMA, ROWS, codec="deflate")
        b = write_avro(SCHEMA, ROWS, codec="deflate")
        assert a == b

    def test_sync_marker_verified(self):
        data = bytearray(write_avro(SCHEMA, ROWS))
        data[-1] ^= 0xFF  # corrupt the final sync marker
        with pytest.raises(AvroError, match="sync"):
            read_avro(bytes(data))

    def test_bad_magic(self):
        with pytest.raises(AvroError, match="magic"):
            read_avro(b"Obj\x02whatever")

    def test_unknown_codec_rejected(self):
        data = write_avro(SCHEMA, ROWS)
        patched = data.replace(b"null", b"xxxx", 1)
        # only rewrite if the codec value actually changed
        if patched != data:
            with pytest.raises(AvroError):
                read_avro(patched)

    def test_nested_schema_rejected(self):
        bad = {
            "type": "record",
            "name": "r",
            "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
        }
        with pytest.raises(AvroError, match="unsupported"):
            write_avro(bad, [])

    def test_schema_json_embedded(self):
        data = write_avro(SCHEMA, ROWS)
        assert json.dumps(SCHEMA).encode() in data

    def test_row_arity_checked(self):
        with pytest.raises(AvroError, match="arity"):
            write_avro(SCHEMA, [(1, "x", 2.0)])
