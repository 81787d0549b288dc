"""GIF codec tests (formats/gif.py): exact LZW round trips across
sizes/interlace/table-reset, structure checks, corruption rejection."""

from __future__ import annotations

import numpy as np
import pytest

from aristoteles_spark.formats.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_meta,
)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1), (4, 4), (13, 17), (64, 80), (300, 5)])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_random_exact(self, shape, interlace):
        rng = np.random.default_rng(hash(shape) % 2**32)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)

    def test_lzw_table_reset_path(self):
        # >4096 distinct strings forces a mid-stream CLEAR + table rebuild
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (200, 200), dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_flat_image_compresses(self):
        flat = np.full((100, 100), 7, dtype=np.uint8)
        data = encode_gif(flat)
        assert len(data) < 1200  # 10000 px -> ~1 KB
        assert np.array_equal(decode_gif(data), flat)

    def test_lzw_kwkwk_case(self):
        # 'aaaa...' triggers the code==len(table) special case
        raw = b"\x01" * 64
        assert _lzw_decode(_lzw_encode(raw, 8), 8) == raw


class TestStructure:
    def test_header_and_meta(self):
        img = np.zeros((3, 7), dtype=np.uint8)
        data = encode_gif(img)
        assert data[:6] == b"GIF89a" and data[-1:] == b";"
        assert gif_meta(data) == (7, 3)

    def test_rejects_non_gif(self):
        with pytest.raises(GifError):
            decode_gif(b"NOT A GIF AT ALL")

    def test_rejects_truncated_lzw(self):
        data = bytearray(encode_gif(np.full((8, 8), 50, dtype=np.uint8)))
        # chop the LZW sub-block payload but keep framing parseable
        with pytest.raises((GifError, IndexError)):
            decode_gif(bytes(data[:20]))

    def test_sniff_and_decode_route_gif(self):
        from aristoteles_spark.formats.imaging import decode, sniff

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        data = encode_gif(img)
        assert sniff(data) == "gif"
        assert np.array_equal(decode(data), img)
