"""WARC codec tests (formats/warc.py): framing round trips, member-gzip
splittability properties, Content-Length verification, rejections."""

from __future__ import annotations

import gzip

import pytest

from aristoteles_spark.formats.warc import (
    WarcError,
    build_record,
    conversion_record,
    read_warc,
    write_warc,
)

RECS = [
    conversion_record("corpus://web/1", "2026-01-01T00:00:00Z", "hello", "1"),
    conversion_record("corpus://web/2", "2026-01-01T00:00:00Z",
                      "unicode £ ☃ text\nwith newlines\n", "2"),
    conversion_record("corpus://books/3", "2026-01-01T00:00:00Z", "", "3"),
]


class TestRoundTrip:
    @pytest.mark.parametrize("compress", [False, True])
    def test_roundtrip(self, compress):
        data = write_warc(RECS, compress=compress)
        back = read_warc(data)
        assert len(back) == len(RECS)
        for (h0, p0), (h1, p1) in zip(RECS, back):
            assert p1 == p0
            for k, v in h0.items():
                assert h1[k] == v
            assert int(h1["Content-Length"]) == len(p0)

    def test_deterministic_bytes(self):
        assert write_warc(RECS) == write_warc(RECS)

    def test_one_gzip_member_per_record(self):
        """The Common Crawl splittability property: each record is an
        independent gzip member — any member parses alone."""
        data = write_warc(RECS, compress=True)
        # find member boundaries by the gzip magic; mtime=0 keeps the
        # 4-byte timestamp zero so magic bytes can't appear by accident
        # in headers... verify by decompress-one-member-at-a-time
        import zlib

        pos, members = 0, 0
        while pos < len(data):
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            rec = d.decompress(data[pos:]) + d.flush()
            assert read_warc(rec)[0][1] == RECS[members][1]
            pos = len(data) - len(d.unused_data)
            members += 1
        assert members == len(RECS)

    def test_plain_gzip_whole_file_also_reads(self):
        plain = write_warc(RECS, compress=False)
        assert read_warc(gzip.compress(plain)) == read_warc(plain)


class TestStructure:
    def test_content_length_verified(self):
        rec = build_record({"WARC-Type": "conversion"}, b"abcdef")
        broken = rec.replace(b"Content-Length: 6", b"Content-Length: 7")
        with pytest.raises(WarcError):
            read_warc(broken)

    def test_missing_terminator(self):
        rec = build_record({"WARC-Type": "conversion"}, b"abc")
        with pytest.raises(WarcError, match="terminat"):
            read_warc(rec[:-2])

    def test_bad_version_line(self):
        with pytest.raises(WarcError, match="version"):
            read_warc(b"HTTP/1.1 200 OK\r\n\r\n")

    def test_requires_warc_type(self):
        with pytest.raises(WarcError, match="WARC-Type"):
            build_record({}, b"x")

    def test_header_crlf_injection_rejected(self):
        with pytest.raises(WarcError, match="CR/LF"):
            build_record(
                {"WARC-Type": "conversion", "X": "a\r\nEvil: yes"}, b""
            )
