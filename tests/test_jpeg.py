"""Baseline-JPEG codec tests (formats/jpeg.py): DC-exact round trips,
bounded lossy error across subsampling/restart/odd-size paths, marker
structure, and corruption rejection."""

from __future__ import annotations

import numpy as np
import pytest

from aristoteles_spark.formats.jpeg import (
    JpegError,
    _canonical_codes,
    AC_LUM_BITS,
    AC_LUM_VALS,
    decode_jpeg,
    encode_jpeg,
)


class TestDcExact:
    @pytest.mark.parametrize("v", [64, 100, 128, 156, 190])
    def test_solid_even_offset_roundtrips_exactly(self, v):
        # at quality 50 the DC quantizer is 16; 8*(v-128) divisible by 16
        # => quantization is lossless for DC-only blocks
        img = np.full((24, 16), v, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=50)), img)

    def test_quadrants_exact_with_restarts(self):
        img = np.zeros((16, 16), dtype=np.uint8)
        for i, v in enumerate([64, 90, 130, 190]):
            y, x = divmod(i, 2)
            img[8 * y : 8 * y + 8, 8 * x : 8 * x + 8] = v
        for dri in (0, 1, 3):
            out = decode_jpeg(encode_jpeg(img, quality=50, restart_interval=dri))
            assert np.array_equal(out, img)


class TestLossyBounds:
    def test_random_gray_bounded(self):
        rng = np.random.default_rng(11)
        for shape in [(8, 8), (17, 23), (40, 56)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=95))
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 24

    def test_smooth_gradient_near_exact(self):
        xx, yy = np.meshgrid(np.arange(64), np.arange(48))
        img = ((xx + yy) * 255 / 110).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    @pytest.mark.parametrize("sub", ["444", "420"])
    def test_color_roundtrip_bounded(self, sub):
        xx, yy = np.meshgrid(np.arange(37), np.arange(29))
        img = np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
        assert out.shape == img.shape
        bound = 8 if sub == "444" else 24  # chroma subsampling is lossier
        assert np.abs(out.astype(int) - img.astype(int)).max() <= bound

    def test_restart_interval_changes_bytes_not_pixels(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (32, 48), dtype=np.uint8)
        plain = decode_jpeg(encode_jpeg(img, quality=85))
        with_rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
        assert np.array_equal(plain, with_rst)

    def test_odd_sizes_crop_to_exact_dimensions(self):
        rng = np.random.default_rng(9)
        for shape in [(1, 1), (7, 9), (9, 7), (15, 17, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=90))
            assert out.shape == img.shape


class TestStructure:
    def test_marker_layout(self):
        data = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in data
        assert bytes([0xFF, 0xC0]) in data  # SOF0: baseline
        assert bytes([0xFF, 0xC4]) in data  # DHT
        assert bytes([0xFF, 0xDB]) in data  # DQT
        assert bytes([0xFF, 0xDA]) in data  # SOS

    def test_huffman_tables_are_canonical_inverses(self):
        enc, dec = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
        assert len(enc) == sum(AC_LUM_BITS) == 162
        for val, (code, length) in enc.items():
            assert dec[(code, length)] == val

    def test_rejects_non_jpeg(self):
        with pytest.raises(JpegError):
            decode_jpeg(b"PK\x03\x04 not a jpeg")

    def test_rejects_lossless(self):
        # SOF3 (lossless) is unsupported; SOF2 (progressive) now decodes
        with pytest.raises(JpegError, match="lossless"):
            decode_jpeg(b"\xff\xd8\xff\xc3\x00\x0b" + b"\x00" * 9)

    def test_rejects_truncated(self):
        data = encode_jpeg(np.full((16, 16), 77, dtype=np.uint8))
        with pytest.raises((JpegError, IndexError, ValueError)):
            decode_jpeg(data[:20])

    def test_rejects_non_interleaved_multi_scan(self):
        """A color SOS naming fewer components than the SOF declares is
        a non-interleaved multi-scan file: must raise, not silently
        return only the Y plane."""
        rng = np.random.default_rng(7)
        data = bytearray(
            encode_jpeg(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        )
        i = bytes(data).find(b"\xff\xda")
        assert i > 0
        # SOS body: len(2) ns(1) [cs td/ta]*ns ss se ah/al — shrink to 1
        # component in place, fixing the segment length
        seglen_old = int.from_bytes(data[i + 2 : i + 4], "big")
        assert data[i + 4] == 3  # ns
        body = bytes(data[i + 4 : i + 2 + seglen_old])
        new_body = bytes([1]) + body[1:3] + body[7:]  # keep comp 1 only
        data[i + 2 : i + 2 + seglen_old] = (
            (2 + len(new_body)).to_bytes(2, "big") + new_body
        )
        with pytest.raises(JpegError, match="non-interleaved"):
            decode_jpeg(bytes(data))

    def test_meta_is_header_only(self):
        """jpeg_meta must not entropy-decode: corrupting every byte
        after SOS still yields (w, h, nc)."""
        from aristoteles_spark.formats.jpeg import jpeg_meta

        data = bytearray(encode_jpeg(np.full((24, 17), 9, dtype=np.uint8)))
        i = bytes(data).find(b"\xff\xda")
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        scan_start = i + 2 + seglen
        data[scan_start:-2] = bytes(len(data) - scan_start - 2)  # zero scan
        assert jpeg_meta(bytes(data)) == (17, 24, 1)


class TestDispatch:
    def test_sniff_and_decode_route_jpeg(self):
        from aristoteles_spark.formats.imaging import decode, sniff

        img = np.full((8, 8), 130, dtype=np.uint8)
        data = encode_jpeg(img, quality=50)
        assert sniff(data) == "jpeg"
        assert np.array_equal(decode(data), img)

    def test_decode_image_seam_handles_jpeg(self):
        from aristoteles_spark.multimodal.codecs import decode_image

        img = np.full((8, 8), 156, dtype=np.uint8)
        out = decode_image(encode_jpeg(img, quality=50))
        assert np.array_equal(np.asarray(out), img)


class TestAnnexKTables:
    def test_ac_tables_cover_every_run_size_symbol(self):
        """Independent structural validation of the hand-entered spec
        tables: each AC table must contain exactly EOB (0x00), ZRL
        (0xF0), and all 160 (run 0-15, size 1-10) symbols, no dupes.
        (Interop note: the encoder also TRANSMITS its tables in DHT
        segments, so any compliant decoder uses the in-stream tables —
        file validity never depends on matching Annex K order.)"""
        from aristoteles_spark.formats.jpeg import (
            AC_CHROM_VALS,
            AC_LUM_VALS,
            DC_CHROM_VALS,
            DC_LUM_VALS,
        )

        expected = {0x00, 0xF0} | {
            (r << 4) | s for r in range(16) for s in range(1, 11)
        }
        assert set(AC_LUM_VALS) == expected and len(AC_LUM_VALS) == 162
        assert set(AC_CHROM_VALS) == expected and len(AC_CHROM_VALS) == 162
        assert DC_LUM_VALS == list(range(12))
        assert DC_CHROM_VALS == list(range(12))
