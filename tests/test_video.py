"""Unit tests for the pure-Python Y4M video container codec."""

from __future__ import annotations

import numpy as np
import pytest

from aristoteles_spark.formats.video import (
    decode_y4m,
    encode_y4m,
    sample_frames,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


class TestY4m:
    @pytest.mark.parametrize("colorspace", ["mono", "420jpeg"])
    def test_round_trip(self, rng, colorspace):
        for shape in [(1, 2, 2), (4, 2, 2), (3, 5, 7), (2, 1, 1)]:
            f = rng.integers(0, 256, shape, dtype=np.uint8)
            w, h, fps, back = decode_y4m(encode_y4m(f, colorspace=colorspace))
            assert (w, h) == (shape[2], shape[1])
            assert fps == (25, 1)
            assert np.array_equal(back, f)

    def test_custom_fps_parsed(self, rng):
        f = rng.integers(0, 256, (1, 2, 2), dtype=np.uint8)
        _, _, fps, _ = decode_y4m(encode_y4m(f, fps=(30000, 1001)))
        assert fps == (30000, 1001)

    def test_empty_stream(self):
        f = np.empty((0, 3, 3), dtype=np.uint8)
        w, h, _, back = decode_y4m(encode_y4m(f))
        assert (w, h) == (3, 3) and back.shape == (0, 3, 3)

    def test_rejects_bad_magic_and_truncation(self, rng):
        with pytest.raises(ValueError, match="YUV4MPEG2"):
            decode_y4m(b"NOTAY4M stream\n")
        f = rng.integers(0, 256, (2, 2, 2), dtype=np.uint8)
        payload = encode_y4m(f)
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(payload[:-1])

    def test_sample_frames_stride(self, rng):
        f = rng.integers(0, 256, (7, 2, 2), dtype=np.uint8)
        w, h, nf, ns, sampled = sample_frames(encode_y4m(f), 3)
        assert (nf, ns) == (7, 3)  # frames 0, 3, 6
        assert np.array_equal(sampled, f[::3])
