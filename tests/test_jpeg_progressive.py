"""Progressive JPEG (SOF2) tests: the progressive encode of an image
must decode to EXACTLY the pixels of its baseline encode (both quantize
identical coefficients; successive approximation recomposes them
bit-for-bit), plus structural checks on the scan script and dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aristoteles_spark.formats.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    jpeg_meta,
)
from aristoteles_spark.formats.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


class TestExactVsBaseline:
    @pytest.mark.parametrize(
        "shape",
        [(8, 8), (16, 24), (17, 23), (1, 1), (7, 5), (40, 40),
         (32, 32, 3), (25, 31, 3), (9, 9, 3), (64, 80, 3)],
    )
    @pytest.mark.parametrize("quality", [90, 50, 10])
    def test_random_matches_baseline(self, shape, quality):
        rng = np.random.default_rng(hash((shape, quality)) % 2**32)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=quality))
        prog = decode_jpeg_progressive(
            encode_jpeg_progressive(img, quality=quality)
        )
        assert np.array_equal(base, prog)

    def test_gradient_matches_baseline(self):
        g = np.linspace(0, 255, 48 * 48).reshape(48, 48).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g)),
            decode_jpeg_progressive(encode_jpeg_progressive(g)),
        )


class TestStructure:
    def test_scan_script(self):
        """Color progression: SOF2 marker, 1 interleaved DC scan + 3 AC
        scans + 1 DC refine + 3 AC refines = 8 SOS markers."""
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        data = encode_jpeg_progressive(img)
        assert bytes([0xFF, 0xC2]) in data
        assert bytes([0xFF, 0xC0]) not in data
        n_sos = 0
        pos = 2
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                break
            m = data[pos + 1]
            pos += 2
            if m == 0xD9:
                break
            if 0xD0 <= m <= 0xD7 or m == 0x01:
                continue
            seglen = struct.unpack(">H", data[pos : pos + 2])[0]
            if m == 0xDA:
                n_sos += 1
                pos += seglen
                # skip entropy data to next marker
                while data[pos] != 0xFF or data[pos + 1] == 0x00:
                    pos += 1
                continue
            pos += seglen
        assert n_sos == 8

    def test_dispatch_via_decode_jpeg(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        prog = encode_jpeg_progressive(img)
        assert np.array_equal(
            decode_jpeg(prog), decode_jpeg_progressive(prog)
        )

    def test_meta_reads_sof2(self):
        img = np.zeros((12, 34), dtype=np.uint8)
        assert jpeg_meta(encode_jpeg_progressive(img)) == (34, 12, 1)

    def test_sniff_routes_progressive(self):
        from aristoteles_spark.formats.imaging import decode, sniff

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        data = encode_jpeg_progressive(img)
        assert sniff(data) == "jpeg"
        assert np.array_equal(decode(data), decode_jpeg_progressive(data))

    def test_codecs_seam_decodes_progressive(self):
        from aristoteles_spark.multimodal.codecs import decode_image

        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
        out = decode_image(encode_jpeg_progressive(img))
        assert out.shape == (16, 16)

    def test_baseline_stream_rejected_by_progressive_decoder(self):
        img = np.zeros((8, 8), dtype=np.uint8)
        with pytest.raises(JpegError, match="progressive"):
            decode_jpeg_progressive(encode_jpeg(img))

    def test_truncated_progressive_fails(self):
        img = np.full((16, 16), 130, dtype=np.uint8)
        data = encode_jpeg_progressive(img)
        with pytest.raises((JpegError, IndexError, ValueError)):
            decode_jpeg_progressive(data[:30])
