"""Unit tests for the pure-Python image codecs (formats/imaging) and the
real-codec multimodal kernels built on them."""

from __future__ import annotations

import numpy as np
import pytest

from aristoteles_spark.formats.imaging import (
    decode,
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    image_meta,
    resize_bilinear,
    resize_nearest,
    sniff,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


class TestPng:
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_round_trip_all_filters(self, rng, filter_type):
        for shape in [(1, 1), (5, 7), (8, 3, 3), (4, 4, 4), (2, 16)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            back = decode_png(encode_png(img, filter_type=filter_type))
            assert np.array_equal(back, img)

    def test_crc_checked(self, rng):
        img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        data = bytearray(encode_png(img))
        data[40] ^= 0xFF  # corrupt inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(data))

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            decode_png(b"not a png at all----")


class TestBmpPpm:
    def test_bmp_round_trip_odd_width(self, rng):
        # odd widths exercise the 4-byte row padding
        for w in (1, 2, 3, 5):
            img = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_bmp_gray_input_replicates_channels(self, rng):
        g = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        back = decode_bmp(encode_bmp(g))
        assert back.shape == (4, 4, 3)
        assert np.array_equal(back[:, :, 0], g)
        assert np.array_equal(back[:, :, 1], g)

    def test_ppm_round_trip(self, rng):
        rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        gray = rng.integers(0, 256, (6, 5), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
        assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)


class TestDispatch:
    def test_sniff_and_decode(self, rng):
        img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
        assert sniff(encode_png(img)) == "png"
        assert sniff(encode_bmp(img)) == "bmp"
        assert sniff(encode_ppm(img)) == "ppm"
        assert sniff(b"\xff\xd8\xff") == "jpeg"  # baseline JPEG: formats/jpeg.py
        assert sniff(b"GIF89a") == "gif"  # formats/gif.py
        assert sniff(b"RIFF\x00\x00\x00\x00WEBP") == "webp"  # formats/webp.py (VP8L)
        for enc in (encode_png, encode_bmp, encode_ppm):
            assert decode(enc(img)).shape[:2] == (3, 3)

    def test_image_meta_exact(self, rng):
        img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        w, h, ch, m = image_meta(encode_png(img))
        assert (w, h, ch) == (4, 4, 1)
        assert m == img.mean() / 255.0

    def test_decode_image_seam_uses_pure_codecs(self, rng):
        from aristoteles_spark.multimodal.codecs import decode_image

        img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        out = decode_image(encode_png(img))
        assert np.array_equal(np.asarray(out), img)
        with pytest.raises(NotImplementedError):
            # LOSSY WebP (VP8 chunk): the VP8L decoder handles lossless
            # only; the seam translates it to its NotImplementedError
            # contract (lossy needs Pillow)
            decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 24)


class TestResize:
    def test_nearest_integer_upscale_is_replication(self, rng):
        img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
        up = resize_nearest(img, 8, 8)
        assert np.array_equal(up[::2, ::2], img)
        assert np.array_equal(up[1::2, 1::2], img)

    def test_bilinear_constant_image_invariant(self):
        img = np.full((7, 5, 3), 137, dtype=np.uint8)
        out = resize_bilinear(img, 11, 3)
        assert out.shape == (3, 11, 3)
        assert (out == 137).all()

    def test_bilinear_downscale_2x_is_block_mean(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
        out = resize_bilinear(img, 2, 2)
        want = np.rint(
            img.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3)
            .reshape(2, 2, 4).mean(axis=2)
        )
        assert np.array_equal(out.astype(float), want)


class TestDhashKernel:
    def test_dhash_bits_match_pixel_gradients(self, rng):
        """The mapInPandas dHash kernel's bit layout: bit r*3+c set iff
        px[r,c] > px[r,c+1] after a lossless PNG round-trip."""
        import hashlib

        from aristoteles_spark.formats.imaging import decode_png, encode_png

        for did in range(5):
            digest = hashlib.md5(f"doc-{did}".encode()).digest()
            img = np.frombuffer(digest, dtype=np.uint8).reshape(4, 4)
            px = decode_png(encode_png(img, filter_type=did % 5))
            assert np.array_equal(px, img)
            expect = 0
            for r in range(4):
                for c in range(3):
                    if img[r, c] > img[r, c + 1]:
                        expect |= 1 << (r * 3 + c)
            bits = px[:, :-1] > px[:, 1:]
            h = 0
            for b in bits.reshape(-1)[::-1]:
                h = (h << 1) | int(b)
            assert h == expect
            assert 0 <= h < 4096
