"""Property-based tests for the pure-Python binary codecs.

Hypothesis drives random shapes/contents through every encoder/decoder
pair; the invariant everywhere is exact round-trip equality. These
complement the example-based tests with shape edge cases (1-pixel rows,
odd BMP padding widths, empty audio, single-frame video, arbitrary
attribute strings in HDF5).
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

_settings = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _img(h, w, ch):
    shape = (h, w) if ch == 1 else (h, w, ch)
    return arrays(np.uint8, shape, elements=st.integers(0, 255))


class TestImagingProperties:
    @settings(_settings)
    @given(
        st.integers(1, 12), st.integers(1, 12),
        st.sampled_from([1, 3, 4]), st.integers(0, 4), st.data(),
    )
    def test_png_round_trip(self, h, w, ch, filt, data):
        from aristoteles_spark.formats.imaging import decode_png, encode_png

        img = data.draw(_img(h, w, ch))
        assert np.array_equal(decode_png(encode_png(img, filter_type=filt)), img)

    @settings(_settings)
    @given(st.integers(1, 9), st.integers(1, 9), st.data())
    def test_bmp_round_trip(self, h, w, data):
        from aristoteles_spark.formats.imaging import decode_bmp, encode_bmp

        img = data.draw(_img(h, w, 3))
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    @settings(_settings)
    @given(st.integers(1, 9), st.integers(1, 9), st.sampled_from([1, 3]), st.data())
    def test_ppm_round_trip(self, h, w, ch, data):
        from aristoteles_spark.formats.imaging import decode_ppm, encode_ppm

        img = data.draw(_img(h, w, ch))
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    @settings(_settings)
    @given(st.integers(1, 8), st.integers(1, 8), st.integers(1, 16), st.integers(1, 16), st.data())
    def test_nearest_resize_dims_and_values(self, h, w, oh, ow, data):
        from aristoteles_spark.formats.imaging import resize_nearest

        img = data.draw(_img(h, w, 1))
        out = resize_nearest(img, ow, oh)
        assert out.shape == (oh, ow)
        # every output pixel is some input pixel
        assert set(np.unique(out)) <= set(np.unique(img))


class TestAudioVideoProperties:
    @settings(_settings)
    @given(
        st.integers(0, 200), st.sampled_from([1, 2]),
        st.sampled_from([8000, 44100]), st.data(),
    )
    def test_wav_round_trip(self, n, ch, rate, data):
        from aristoteles_spark.formats.audio import decode_wav, encode_wav

        shape = (n,) if ch == 1 else (n, ch)
        s = data.draw(arrays(np.int16, shape, elements=st.integers(-32768, 32767)))
        r, back = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert np.array_equal(back.reshape(shape), s)

    @settings(_settings)
    @given(
        st.integers(0, 6), st.integers(1, 6), st.integers(1, 6),
        st.sampled_from(["mono", "420jpeg"]), st.data(),
    )
    def test_y4m_round_trip(self, n, h, w, cs, data):
        from aristoteles_spark.formats.video import decode_y4m, encode_y4m

        f = data.draw(arrays(np.uint8, (n, h, w), elements=st.integers(0, 255)))
        ww, hh, _, back = decode_y4m(encode_y4m(f, colorspace=cs))
        assert (ww, hh) == (w, h)
        assert np.array_equal(back, f)


class TestHdf5Properties:
    @settings(_settings)
    @given(
        st.dictionaries(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1,
                max_size=20,
            ).filter(lambda s: "\x00" not in s),
            st.one_of(
                st.text(
                    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                    max_size=30,
                ),
                st.integers(-(2**40), 2**40),
                st.floats(allow_nan=False, width=64),
            ),
            max_size=5,
        ),
        st.lists(
            st.floats(allow_nan=False, width=64), min_size=0, max_size=50
        ),
    )
    def test_attrs_and_values_round_trip(self, attrs, values):
        import tempfile

        from aristoteles_spark.formats.minihdf5 import MiniHDF5Writer, read_hdf5

        w = MiniHDF5Writer()
        w.root.attrs.update(attrs)
        g = w.root.create_group("g")
        g.create_dataset("v", values)
        with tempfile.NamedTemporaryFile(suffix=".h5") as f:
            w.write(f.name)
            back = read_hdf5(f.name)
        assert back["attrs"] == attrs
        assert back["groups"]["g"]["datasets"]["v"]["values"] == values


class TestGifProperties:
    @settings(_settings)
    @given(st.integers(1, 24), st.integers(1, 24), st.booleans(), st.data())
    def test_gif_round_trip(self, h, w, interlace, data):
        from aristoteles_spark.formats.gif import decode_gif, encode_gif

        img = data.draw(_img(h, w, 1))
        assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)

    @settings(_settings)
    @given(st.binary(min_size=0, max_size=400))
    def test_lzw_round_trip_arbitrary_bytes(self, raw):
        from aristoteles_spark.formats.gif import _lzw_decode, _lzw_encode

        assert _lzw_decode(_lzw_encode(raw, 8), 8) == raw


class TestJpegProperties:
    @settings(_settings)
    @given(
        st.integers(1, 3), st.integers(1, 3),
        st.sampled_from([0, 1, 2]), st.data(),
    )
    def test_jpeg_dc_exact_tiled(self, bh, bw, dri, data):
        """Images of solid 8x8 tiles with even-offset values survive
        quality-50 quantization bit-exactly (DC-only blocks), for any
        tile grid and restart interval."""
        from aristoteles_spark.formats.jpeg import decode_jpeg, encode_jpeg

        vals = data.draw(
            st.lists(
                st.integers(32, 95).map(lambda k: 2 * k),  # even 64..190
                min_size=bh * bw, max_size=bh * bw,
            )
        )
        img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        for i, v in enumerate(vals):
            y, x = divmod(i, bw)
            img[8 * y : 8 * y + 8, 8 * x : 8 * x + 8] = v
        out = decode_jpeg(encode_jpeg(img, quality=50, restart_interval=dri))
        assert np.array_equal(out, img)

    @settings(_settings)
    @given(st.integers(1, 40), st.integers(1, 40), st.data())
    def test_jpeg_lossy_bounded_any_shape(self, h, w, data):
        from aristoteles_spark.formats.jpeg import decode_jpeg, encode_jpeg

        img = data.draw(_img(h, w, 1))
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
